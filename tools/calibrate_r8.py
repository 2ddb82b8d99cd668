#!/usr/bin/env python3
"""Round-8 DuckDB calibration refresh (SURVEY §5.0) — dev-only tooling.

Re-times the ORACLE SQL of the post-round-3 operator families (graph
loops, s12/s13, t15, d18, plus the round-8 additions q78/d19/a11/p4) in
DuckDB at sf0.1 and prints a markdown table next to the committed quiet
Spark anchors (tools/bench_anchor.json). NOT part of the shipped library.

Usage:
  python3 tools/calibrate_r8.py <verifyOutDir-with-oracle_sql.json> <sfDir>

The Spark column is the committed anchor (quiet local[32] sf0.1 run);
DuckDB runs here, min of 2 (first run warms the OS page cache the Spark
anchors also enjoy).
"""
import sys, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

TARGETS = [
    "q74_pagerank", "q76_bfs_hops", "q78_cow_merge",
    "d18_cluster_split", "d19_edit_dedup_auto",
    "s12_ann_incremental", "s13_filtered_ann",
    "t15_tfidf_keywords", "a11_temporal_split", "p4_cached_chain",
]


def main(out_dir: str, sf_dir: str) -> None:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    anchors = json.load(open("tools/bench_anchor.json"))["queries"]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    rows = []
    for name in TARGETS:
        sql = oracle.get(name)
        if sql is None:
            rows.append((name, anchors.get(name), None, "no oracle SQL"))
            continue
        times = []
        for _ in range(2):
            t0 = time.time()
            try:
                n = len(con.execute(sql).fetchall())
            except Exception as e:  # noqa: BLE001 — report, keep calibrating
                rows.append((name, anchors.get(name), None, f"ERR {e}"))
                times = None
                break
            times.append(time.time() - t0)
        if times is not None:
            rows.append((name, anchors.get(name), min(times), f"{n} rows"))
    print("| query | Spark anchor (s) | DuckDB oracle (s) | note |")
    print("|---|---|---|---|")
    for name, sp, dk, note in rows:
        sps = f"{sp:.2f}" if sp is not None else "—"
        dks = f"{dk:.2f}" if dk is not None else "—"
        print(f"| {name} | {sps} | {dks} | {note} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
