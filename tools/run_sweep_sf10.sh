#!/bin/bash
# Full 200-query sweep at sf10 (VERDICT r15 item 1 / r16 item 1).
#
# Runs graft.Bench against /tmp/graft-sf10 from a FROZEN classpath copy
# (so repo compiles during the multi-hour sweep cannot perturb the running
# JVM), in its own cwd (so BENCH_FULL.json lands there, not in the repo).
#
# Anchors: Bench picks tools/bench_anchor_sf10.json automatically when the
# data dir's basename carries an sf10 tag (round 17 — the per-SF anchor
# selection). Until that file exists, pass SPARK_GRAFT_BENCH_NORERUN=1 so
# the sf0.1 anchors don't flag (and pointlessly re-run) every query; once
# it is committed, run WITHOUT NORERUN and the regression gate works at
# this rung too.
#
# STATED HEAP: 32 g (local[32] concentrates the whole "cluster's"
# working set in one JVM; on a real cluster this is per-executor memory).
#
# Bench aborts (exit 2) if the SparkContext dies mid-sweep — a partial
# log ends at the abort line instead of accumulating post-shutdown noise.
set -euo pipefail
WORK=${SWEEP_WORK:-/tmp/graft-sweep17}
rm -rf "$WORK"
mkdir -p "$WORK/tools"
cp /root/repo/tools/bench_anchor.json "$WORK/tools/"
[ -f /root/repo/tools/bench_anchor_sf10.json ] && \
  cp /root/repo/tools/bench_anchor_sf10.json "$WORK/tools/"
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
SPARK_GRAFT_BENCH_VERBOSE=1 \
exec java $ADD_OPENS \
  -Xmx${SWEEP_HEAP:-32g} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$WORK/classes:/opt/spark/jars/*" \
  graft.Bench
