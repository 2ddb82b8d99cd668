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
    "s12_incremental_ann", "s13_filtered_ann",
    "t15_tfidf_keywords", "a11_temporal_split", "p4_cached_chain",
    # round-8 session-2 additions
    "d21_substring_dedup", "q82_targeted_delete", "q83_time_travel",
    "s16_ann_sq8", "s17_mmr_rerank", "st10_drift_monitor",
    "a13_quota_sample", "t17_lm_score",
    # round-8 session-3 additions (lakehouse + DSIR + incremental dedup)
    "d23_incremental_containment", "q86_integrity_audit", "q87_scd2_pit",
    "m7_phash_clusters", "q88_mor_delete", "q89_ivm_join",
    "t19_dsir_weights", "a14_dsir_resample", "q90_shallow_clone",
    "q91_bloom_lookup", "q92_schema_evolution",
]


def run_one(out_dir: str, sf_dir: str, name: str) -> None:
    """Subprocess entry: time one oracle query (min of 2), print one line."""
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    sql = oracle.get(name)
    if sql is None:
        print(f"{name}\tNOSQL\t-")
        return
    times = []
    for _ in range(2):
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
        except Exception as e:  # noqa: BLE001 — report, keep calibrating
            print(f"{name}\tERR\t{e}")
            return
        times.append(time.time() - t0)
    print(f"{name}\t{min(times):.2f}\t{n} rows")


def main(out_dir: str, sf_dir: str, timeout_s: int = 300) -> None:
    """Each target runs in its own subprocess under `timeout_s` — a DuckDB
    oracle that cannot finish inside the budget IS the calibration result
    (recorded as >Ns), not a reason to lose the rest of the table."""
    import subprocess
    anchors = json.load(open("tools/bench_anchor.json"))["queries"]
    print("| query | Spark anchor (s) | DuckDB oracle (s) | note |")
    print("|---|---|---|---|")
    for name in TARGETS:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", out_dir, sf_dir, name],
                capture_output=True, text=True, timeout=timeout_s)
            line = r.stdout.strip().split("\n")[-1] if r.stdout.strip() else f"{name}\tERR\t{r.stderr[-200:]}"
        except subprocess.TimeoutExpired:
            line = f"{name}\t>{timeout_s}\ttimeout"
        parts = line.split("\t")
        sp = anchors.get(name)
        sps = f"{sp:.2f}" if sp is not None else "—"
        print(f"| {parts[0]} | {sps} | {parts[1]} | {parts[2] if len(parts) > 2 else ''} |",
              flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main(sys.argv[1], sys.argv[2])
