package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.ops.Layout

/** Manifest NDV statistics: per-file KMV synopses for the declared
  * `ndvKey` columns, merged at scan into optimizer-visible per-column
  * distinct counts (DSv2 column statistics → catalyst attributeStats)
  * — proven by a JOIN-SIDE BROADCAST DECISION FLIP: the same
  * aggregate-then-join query broadcasts its aggregated side only when
  * the NDV says the group count is tiny.
  */
class NdvStatsSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ndv").toString
    spark.conf.set("spark.sql.catalog.gndv",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gndv.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  /** Broadcast in the STATIC physical plan — the cost-based decision
    * the statistics drive. (AQE would later convert any small-enough
    * shuffle at runtime regardless of estimates; the point of optimizer
    * NDV is making the right plan BEFORE running anything, which at
    * 100 TB is the difference between planning a shuffle and not.)
    */
  private def hasBroadcast(df: DataFrame): Boolean = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(walk)
    // executedPlan (exchanges inserted); the test runs with AQE OFF so
    // this is exactly the static cost-based plan
    walk(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastExchangeLike])
  }

  test("KMV synopses ride the manifest; merged estimate lands in graft.t.files and scan column stats") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gndv.t (k BIGINT, g STRING, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k', 'ndvKey'='g')")
    // two inserts, 10 distinct g values over 4000 rows
    for (half <- 0 to 1) {
      (0 until 2000).map(i => (half * 2000L + i, s"g${i % 10}", i / 2.0))
        .toDF("k", "g", "v").createOrReplaceTempView("ndv_src")
      sql("INSERT INTO gndv.t SELECT * FROM ndv_src")
    }
    // per-file estimates exposed in the metadata table
    val ndvRows = sql("SELECT ndv FROM gndv.t.files WHERE rows > 0")
      .collect().map(_.getMap[String, Long](0))
    assert(ndvRows.nonEmpty && ndvRows.forall(m => m.contains("g")),
      s"every data file must carry a g synopsis: ${ndvRows.toSeq}")
    assert(ndvRows.forall(m => m("g") == 10L),
      s"below k the estimate is exact: ${ndvRows.map(_("g")).toSeq}")
    // the scan's merged column stats see ONE estimate across files
    val scanStats = new graft.sources.GraftScanBuilderProbe(
      spark, s"$wh/t").columnStats()
    assert(scanStats.get("g").contains(10L),
      s"merged scan NDV must be 10: $scanStats")
  }

  test("NDV flips the broadcast decision on an aggregate-join (CBO)") {
    wh
    import spark.implicits._
    // twin fact tables: same data, one WITH ndvKey, one WITHOUT
    for (t <- Seq("fa", "fb")) {
      sql(s"CREATE TABLE gndv.$t (k BIGINT, g STRING, v DOUBLE) " +
        "TBLPROPERTIES ('statsKey'='k'" +
        (if (t == "fa") ", 'ndvKey'='g'" else "") + ")")
      (0 until 20000).map(i => (i.toLong, s"grp${i % 8}", i / 2.0))
        .toDF("k", "g", "v").createOrReplaceTempView(s"${t}_src")
      sql(s"INSERT INTO gndv.$t SELECT * FROM ${t}_src")
    }
    // the probe side must be BIG (over the broadcast threshold), so the
    // only broadcastable side is the aggregate — whose size estimate is
    // exactly what the NDV statistic determines
    sql("CREATE TABLE gndv.big (g STRING, w DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='w')")
    (0 until 20000).map(i => (s"grp${i % 8}", i * 1.0)).toDF("g", "w")
      .createOrReplaceTempView("big_src")
    sql("INSERT INTO gndv.big SELECT * FROM big_src")
    def aggJoin(t: String): DataFrame = sql(
      s"""SELECT j.g, j.c, b.w FROM
         |  (SELECT g, count(*) AS c FROM gndv.$t GROUP BY g) j
         |JOIN gndv.big b ON j.g = b.g""".stripMargin)
    val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val savedThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    // a threshold below the raw table size but far above 8 grouped rows
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    // AQE off: it would convert any small runtime shuffle regardless of
    // estimates — the point here is the STATIC cost-based decision
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val withNdv = aggJoin("fa")
      val without = aggJoin("fb")
      assert(withNdv.collect().length == 20000 &&
        without.collect().length == 20000, "answers agree")
      assert(hasBroadcast(withNdv),
        "NDV=8 → the aggregate is provably tiny → broadcast:\n" +
          withNdv.queryExecution.executedPlan)
      // the twin without NDV estimates the aggregate at its child's
      // size and must NOT broadcast under the same threshold — the
      // flip isolates the statistic as the cause
      assert(!hasBroadcast(without),
        "without NDV the same plan must stay shuffle-joined:\n" +
          without.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", savedCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThr)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("FILTERED scans keep base statistics: kept-file rows/NDV report and flip the broadcast on a filtered join side") {
    wh
    import spark.implicits._
    // twin facts again, but this time the aggregate side carries a
    // pushed WHERE — the common production shape (join on a filtered
    // fact) that round 13's gate refused stats for entirely
    for (t <- Seq("ff", "fg")) {
      sql(s"CREATE TABLE gndv.$t (k BIGINT, g STRING, v DOUBLE) " +
        "TBLPROPERTIES ('statsKey'='k'" +
        (if (t == "ff") ", 'ndvKey'='g'" else "") + ")")
      for (half <- 0 to 1) {
        (0 until 20000).map(i => (half * 20000L + i, s"grp${i % 8}",
            i / 2.0))
          .toDF("k", "g", "v").createOrReplaceTempView(s"${t}_src")
        sql(s"INSERT INTO gndv.$t SELECT * FROM ${t}_src")
      }
    }
    // scan-level base stats under a pushed range filter: pushFilters
    // returns every conjunct as a residual, so the scan emits exactly
    // the KEPT files' rows — numRows/NDV must keep reporting (they
    // describe the scan's output; FilterEstimation owns the residual)
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
      LessThan, Literal}
    import org.apache.spark.sql.types.LongType
    val under30k = Seq(LessThan(AttributeReference("k", LongType)(),
      Literal(30000L)))
    val (rowsF, ndvF) = new graft.sources.GraftScanBuilderProbe(
      spark, s"$wh/ff").stats(under30k)
    assert(rowsF.exists(r => r >= 20000L && r <= 40000L),
      s"kept-file row sum must report under a filter (files overlapping " +
        s"k<30000 stay; exact value depends on chunking): $rowsF")
    assert(ndvF.get("g").contains(8L),
      s"kept-file synopses must merge under a filter: $ndvF")
    // a filter PRUNING files tightens the base stats to the kept subset
    // (the k<20000 boundary is clean: insert 2 starts at exactly 20000,
    // so every one of its files prunes regardless of chunking)
    val under20k = Seq(LessThan(AttributeReference("k", LongType)(),
      Literal(20000L)))
    val (rowsP, ndvP) = new graft.sources.GraftScanBuilderProbe(
      spark, s"$wh/ff").stats(under20k)
    assert(rowsP.contains(20000L),
      s"insert 2's files (k ≥ 20000) all prune away: $rowsP")
    assert(ndvP.get("g").contains(8L), s"kept subset still reports: $ndvP")
    // and the statistics drive the plan: the same filtered
    // aggregate-join broadcasts only when the NDV is declared
    sql("CREATE TABLE gndv.big2 (g STRING, w DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='w')")
    (0 until 20000).map(i => (s"grp${i % 8}", i * 1.0)).toDF("g", "w")
      .createOrReplaceTempView("big2_src")
    sql("INSERT INTO gndv.big2 SELECT * FROM big2_src")
    def aggJoin(t: String): DataFrame = sql(
      s"""SELECT j.g, j.c, b.w FROM
         |  (SELECT g, count(*) AS c FROM gndv.$t
         |   WHERE k < 30000 GROUP BY g) j
         |JOIN gndv.big2 b ON j.g = b.g""".stripMargin)
    val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val savedThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val withNdv = aggJoin("ff")
      val without = aggJoin("fg")
      assert(withNdv.collect().length == 20000 &&
        without.collect().length == 20000, "answers agree")
      assert(hasBroadcast(withNdv),
        "filtered side with NDV → aggregate provably tiny → broadcast:\n" +
          withNdv.queryExecution.executedPlan)
      assert(!hasBroadcast(without),
        "without NDV the filtered twin must stay shuffle-joined:\n" +
          without.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", savedCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThr)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("CALL graft.system.analyze backfills synopses for pre-existing files and declares ndvKey") {
    wh
    import spark.implicits._
    // table created WITHOUT ndvKey and WITHOUT statsKey: entries carry
    // no stats at all — the legacy-table shape ANALYZE exists for
    sql("CREATE TABLE gndv.legacy (k BIGINT, g STRING)")
    for (b <- 0 to 1) {
      (0 until 1500).map(i => (b * 1500L + i, s"g${i % 12}"))
        .toDF("k", "g").createOrReplaceTempView("legacy_src")
      sql("INSERT INTO gndv.legacy SELECT * FROM legacy_src")
    }
    // before: no synopses anywhere
    assert(new graft.sources.GraftScanBuilderProbe(spark, s"$wh/legacy")
      .columnStats().isEmpty)
    val v = sql("CALL gndv.system.analyze(table => 'legacy', cols => 'g')")
      .head().getInt(0)
    assert(v == Layout.snapshotVersions(spark, s"$wh/legacy").last)
    // after: the merged scan estimate is exact (12 < k), the property
    // is declared, content is untouched
    assert(new graft.sources.GraftScanBuilderProbe(spark, s"$wh/legacy")
      .columnStats().get("g").contains(12L))
    assert(Layout.snapshotMeta(spark, s"$wh/legacy").header
      .get("ndvKey").contains("g"))
    assert(sql("SELECT count(*) FROM gndv.legacy").head().getLong(0) == 3000)
    // previously stat-less entries gained EXACT row counts: the
    // metadata-only COUNT pushdown now answers with zero tasks
    val plan = sql("SELECT count(*) FROM gndv.legacy")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"post-ANALYZE count must answer from the manifest:\n$plan")
    // subsequent INSERTs keep the statistics fresh via the declared key
    (5000 until 5100).map(i => (i.toLong, s"h${i % 5}"))
      .toDF("k", "g").createOrReplaceTempView("legacy_more")
    sql("INSERT INTO gndv.legacy SELECT * FROM legacy_more")
    assert(new graft.sources.GraftScanBuilderProbe(spark, s"$wh/legacy")
      .columnStats().get("g").contains(17L),
      "fresh files' synopses merge with the backfilled ones (12 g + 5 h)")
  }

  test("an all-NULL file's EMPTY synopsis round-trips the manifest; ndvKey threads through partitioned CREATE; reserved columns refuse rename") {
    wh
    import spark.implicits._
    // partitioned CREATE must not silently drop the ndvKey declaration
    sql("CREATE TABLE gndv.pt (k BIGINT, g STRING, p STRING) " +
      "PARTITIONED BY (p) " +
      "TBLPROPERTIES ('statsKey'='k', 'ndvKey'='g')")
    assert(Layout.snapshotMeta(spark, s"$wh/pt").header
      .get("ndvKey").contains("g"),
      "ndvKey must survive the partitioned CREATE path")
    // first insert: g entirely NULL → EMPTY sketch, serialized "k=g:"
    (0 until 100).map(i =>
        (i.toLong, null.asInstanceOf[String], s"p${i % 2}"))
      .toDF("k", "g", "p").createOrReplaceTempView("pt_null")
    sql("INSERT INTO gndv.pt SELECT * FROM pt_null")
    // second insert: real values
    (100 until 200).map(i => (i.toLong, s"g${i % 6}", s"p${i % 2}"))
      .toDF("k", "g", "p").createOrReplaceTempView("pt_vals")
    sql("INSERT INTO gndv.pt SELECT * FROM pt_vals")
    // the empty synopsis must SURVIVE the manifest round-trip — a
    // dropped entry would block the whole table's statistics
    val stats = new graft.sources.GraftScanBuilderProbe(spark, s"$wh/pt")
      .columnStats()
    assert(stats.get("g").contains(6L),
      s"all-NULL file's empty sketch merges as a no-op: $stats")
    // columns the statistics/partition properties reference refuse
    // rename — renaming would orphan every recorded synopsis
    val ex = intercept[Exception] {
      Layout.snapshotRenameColumn(spark, s"$wh/pt", "g", "label")
    }
    assert(ex.getMessage.contains("overwrite-class"), ex.getMessage)
    // partSpec source columns refuse too
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-ndv-ps").toString + "/t"
    Layout.snapshotAppendSpec(spark, root2,
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("k", "ts"), "days(ts)")
    val ex2 = intercept[Exception] {
      Layout.snapshotRenameColumn(spark, root2, "ts", "event_ts")
    }
    assert(ex2.getMessage.contains("overwrite-class"), ex2.getMessage)
  }

  test("NDV survives the append path and stays mergeable across many files") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-ndv2").toString + "/t"
    // 5 appends, overlapping value sets: true NDV = 200
    for (b <- 0 until 5) {
      Layout.snapshotAppend(spark, root,
        (0 until 1000).map(i => (b * 1000L + i, s"u${(i + b * 37) % 200}"))
          .toDF("k", "u"),
        statsKey = Some("k"), ndvKey = Some("u"))
    }
    val (_, index) = Layout.snapshotTableWithIndex(spark, root)
    val entries = index.inputFiles
    assert(entries.length >= 5, s"need >=5 files, got ${entries.length}")
    val sketches = Layout.snapshotMeta(spark, root).header // header check
    val merged = Layout.snapshotFilesTable(spark, root)
      .select("ndv").collect().map(_.getMap[String, Long](0))
      .filter(_.nonEmpty)
    assert(merged.nonEmpty)
    // scan-level merged estimate within KMV tolerance of 200
    val est = new graft.sources.GraftScanBuilderProbe(spark, root)
      .columnStats()("u")
    assert(est > 150 && est < 260,
      s"merged estimate $est should be within ~13% RSE of 200")
  }
}
