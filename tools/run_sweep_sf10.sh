#!/bin/bash
# Full 200-query sweep at sf10 (VERDICT r15 item 1).
#
# Runs graft.Bench against /tmp/graft-sf10 from a FROZEN classpath copy
# (so repo compiles during the multi-hour sweep cannot perturb the running
# JVM), in its own cwd (so BENCH_FULL.json lands there, not in the repo),
# with SPARK_GRAFT_BENCH_NORERUN=1 (the committed anchors are sf0.1
# numbers — at sf10 every query would "regress" and the confirmation
# rerun would double a multi-hour sweep).
#
# STATED HEAP: 32 g (local[32] concentrates the whole "cluster's"
# working set in one JVM; on a real cluster this is per-executor memory).
set -euo pipefail
WORK=/tmp/graft-sweep16
rm -rf "$WORK"
mkdir -p "$WORK/tools"
cp /root/repo/tools/bench_anchor.json "$WORK/tools/"
cp -r /root/repo/target/scala-2.13/classes "$WORK/classes"
cd "$WORK"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=/tmp/graft-sf10 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_NORERUN=1 \
SPARK_GRAFT_BENCH_VERBOSE=1 \
exec java $ADD_OPENS \
  -Xmx${SWEEP_HEAP:-32g} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$WORK/classes:/opt/spark/jars/*" \
  graft.Bench
