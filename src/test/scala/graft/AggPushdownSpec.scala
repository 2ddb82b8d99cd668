package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** METADATA-ONLY AGGREGATES on the SQL path: an unfiltered global
  * COUNT(*) / COUNT(col) / MIN / MAX over a clean snapshot table answers
  * from manifest stats via DSv2 aggregate pushdown — the plan is a
  * LocalTableScan (zero tasks, zero data I/O), and anything not provably
  * exact falls back to the real scan.
  */
class AggPushdownSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-aggpd").toString
    spark.conf.set("spark.sql.catalog.gagg",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gagg.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  private def isLocal(q: org.apache.spark.sql.DataFrame): Boolean = {
    val s = q.queryExecution.executedPlan.toString
    s.contains("LocalTableScan") && !s.contains("BatchScan") &&
      !s.contains("parquet")
  }

  test("COUNT(*), MIN, MAX, COUNT(col) answer from the manifest with zero data I/O") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gagg.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsKey'='k')")
    (1 to 100).map(i => (i.toLong, if (i % 10 == 0) null else s"v$i"))
      .toDF("k", "v").createOrReplaceTempView("agg_src")
    sql("INSERT INTO gagg.t SELECT * FROM agg_src")
    (101 to 250).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("agg_src2")
    sql("INSERT INTO gagg.t SELECT * FROM agg_src2")

    val q = sql("SELECT count(*) AS n, min(k) AS mn, max(k) AS mx, " +
      "count(k) AS nk FROM gagg.t")
    val r = q.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((250L, 1L, 250L, 250L)))
    assert(isLocal(q), s"must answer from manifest:\n" +
      q.queryExecution.executedPlan)
  }

  test("a filter, a group-by, or a non-stats aggregate falls back to the real scan — and stays exact") {
    wh
    val filtered = sql("SELECT count(*) FROM gagg.t WHERE k > 100")
    assert(!isLocal(filtered))
    assert(filtered.head().getLong(0) == 150L)
    val grouped = sql("SELECT v, count(*) FROM gagg.t GROUP BY v")
    assert(!isLocal(grouped) && grouped.count() == 241) // 240 distinct + null
    val sum = sql("SELECT sum(k) FROM gagg.t")
    assert(!isLocal(sum) && sum.head().getLong(0) == (1L to 250L).sum)
    // MIN over a string column: strings are not in the exact-integral
    // class — falls back, stays right
    val smin = sql("SELECT min(v) FROM gagg.t")
    assert(!isLocal(smin) && smin.head().getString(0) == "v1")
  }

  test("COUNT(col) rules: stats columns answer, stat-less columns fall back; MOR debt refuses the shortcut") {
    wh
    // k IS the stats column: its null count (0) is recorded per file
    val nk = sql("SELECT count(k) AS nk FROM gagg.t")
    assert(isLocal(nk), s"count(statsCol) must answer from nulls stats:\n" +
      nk.queryExecution.executedPlan)
    assert(nk.head().getLong(0) == 250L)
    // v records no stats (not a statsKey column): falls back, stays exact
    val nv = sql("SELECT count(v) AS nv FROM gagg.t")
    assert(!isLocal(nv) && nv.head().getLong(0) == 240L) // 10 nulls
    // a MOR delete makes manifest arithmetic an over-count: the builder
    // for sidecar tables is the V1 fallback, which never sees the
    // aggregate — the count re-reads truth
    sql("DELETE FROM gagg.t WHERE k IN (1, 2, 3)")
    val after = sql("SELECT count(*) FROM gagg.t")
    assert(!isLocal(after) && after.head().getLong(0) == 247L)
  }

  test("time travel answers from the pinned version's manifest") {
    wh
    val v2 = sql("SELECT count(*), max(k) FROM gagg.t VERSION AS OF 2")
    assert(isLocal(v2))
    assert((v2.head().getLong(0), v2.head().getLong(1)) == ((100L, 100L)))
  }

  test("an empty table answers COUNT 0 and null MIN/MAX from metadata") {
    wh
    sql("CREATE TABLE gagg.empty (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsKey'='k')")
    val q = sql("SELECT count(*), min(k), max(k) FROM gagg.empty")
    val r = q.head()
    assert(isLocal(q) && r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }
}
