#!/usr/bin/env python3
"""Assemble the per-query sf10 table from segmented sweep logs.

A multi-hour sweep at sf10 runs as segments (SPARK_GRAFT_BENCH_SKIP /
_ONLY) so a kill never re-pays measured rows. Each segment's per-query
lines live in its log (`[bench] <name> <sec> s`); this merges them into
one BENCH_FULL-shaped JSON. A `FAILED:` line invalidates the row UNLESS a
later segment re-measured it (later segments win — that is the point of
re-running a failed row on a fixed classpath).

Usage: tools/merge_sweep_segments.py out.json log1 [log2 ...]
Logs are applied in order; later rows/new measurements override earlier.
"""
import json
import re
import sys

out = sys.argv[1]
queries: dict[str, float] = {}
failed: set[str] = set()
segments = []
for path in sys.argv[2:]:
    seg = {"log": path, "rows": 0}
    # a FAILED query still prints its wall-to-failure "timing" row on the
    # next line — that is time-to-death, not a measurement, so a name
    # failed IN THIS FILE never records a time from this file; only a
    # later segment's clean row clears it
    failed_here: set[str] = set()
    # WITHIN one log, a query can print TWO clean rows: Bench's
    # end-of-sweep confirmation rerun (runs when the rung has committed
    # anchors). Bench itself keeps min(first, rerun) — mirror that here;
    # later-row-wins would bake the possibly-slower rerun into the merged
    # table and then into the anchor. ACROSS logs, later segments still
    # win outright (that is the point of re-running on a fixed classpath).
    seg_q: dict[str, float] = {}
    with open(path, errors="replace") as f:
        for line in f:
            m = re.match(r"^\[bench\] ([a-z0-9_]+) +([0-9.]+) s\s*$", line)
            if m:
                name, sec = m.group(1), float(m.group(2))
                if name in failed_here:
                    continue
                seg_q[name] = min(sec, seg_q.get(name, sec))
                continue
            m = re.match(r"^\[bench\] ([a-z0-9_]+) (FAILED|ABORT)", line)
            if m:
                name = m.group(1)
                failed_here.add(name)
                failed.add(name)
                seg_q.pop(name, None)
                queries.pop(name, None)
    for name, sec in seg_q.items():
        failed.discard(name)  # this segment re-measured it cleanly
        queries[name] = sec
    seg["rows"] = len(seg_q)
    segments.append(seg)

doc = {
    "metric": "total",
    "value": round(sum(queries.values()), 3),
    "unit": "sec",
    "queries": {k: round(v, 3) for k, v in sorted(queries.items())},
    "errors": sorted(failed),
    "n_queries": len(queries),
    "sf": "/tmp/graft-sf10",
    "segments": segments,
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1)
print(f"{len(queries)} rows, {len(failed)} failed, "
      f"total {doc['value']:.1f}s -> {out}")
