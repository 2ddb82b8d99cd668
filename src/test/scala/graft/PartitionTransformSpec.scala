package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.ops.{Layout, PartSpec}
import graft.sources.GraftScan

/** Partition TRANSFORMS + multi-column partitioning ([[PartSpec]]):
  * `PARTITIONED BY (days(ts), bucket(n, k))` declared through SQL or
  * [[Layout.snapshotAppendSpec]], recorded per file as dim-prefixed
  * transformed value sets, and pruned — statically (range predicates
  * through monotone transforms, equality through bucket hashing) and
  * at runtime (DPP on the transform's SOURCE column) — with observed
  * file counts as evidence.
  */
class PartitionTransformSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ptspec").toString
    spark.conf.set("spark.sql.catalog.gpt",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpt.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  private def graftScans(df: DataFrame): Seq[GraftScan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: walk(s.plan)
      case other => other +: (other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk))
    }
    walk(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b.scan }
      .collect { case g: GraftScan => g }
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("PartSpec parsing, validation, and write/prune value agreement") {
    val dims = PartSpec.parse("days(ts), identity(cat), bucket(16,k), truncate(3,name), hours(ts)")
    assert(dims.map(_.render) == Seq("days(ts)", "identity(cat)",
      "bucket(16,k)", "truncate(3,name)", "hours(ts)"))
    intercept[IllegalArgumentException] { PartSpec.parse("years(ts)") }
    // literal mapping: epoch-day floor matches timestamps pre/post epoch
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val d = PartSpec.Days(0, "ts")
    def dayOf(s: String) = PartSpec.valueOf(d,
      Literal(DateTimeUtils.fromJavaTimestamp(ts(s)),
        org.apache.spark.sql.types.TimestampType)).get
    assert(dayOf("1970-01-01 05:00:00") == "0")
    assert(dayOf("1970-01-02 00:00:00") == "1")
    assert(dayOf("1969-12-31 23:00:00") == "-1",
      "floor (not truncate-toward-zero) semantics before the epoch")
    // bucket: pmod(xxhash64(v), n) — matches the SQL function's seed
    val b = PartSpec.Bucket(0, 8, "k")
    val h = spark.sql("SELECT pmod(xxhash64(42L), 8)").head().getLong(0)
    assert(PartSpec.valueOf(b,
      Literal(42L, org.apache.spark.sql.types.LongType)).contains(h.toString))
  }

  test("snapshotAppendSpec records dim-prefixed transformed value sets in the manifest") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-ptrec").toString + "/t"
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00"), "a"),
      (2L, ts("2024-03-02 11:00:00"), "b"),
      (3L, null.asInstanceOf[java.sql.Timestamp], "c"))
      .toDF("k", "ts", "cat")
    Layout.snapshotAppendSpec(spark, root, df, "days(ts),identity(cat)",
      shuffleByPartition = false)
    val hdr = Layout.snapshotMeta(spark, root).header
    assert(hdr.get("partSpec").contains("days(ts),identity(cat)"))
    val parts = Layout.snapshotFilesTable(spark, root)
      .select(explode(col("partitions"))).as[String].collect().toSet
    val day0 = (ts("2024-03-01 00:00:00").getTime / 86400000L).toString
    assert(parts.contains(s"0:$day0"), s"recorded: $parts")
    assert(parts.contains("1:a") && parts.contains("1:b"))
    assert(parts.contains("0:\u0000"), "null ts records the sentinel")
    // a spec that cannot apply refuses at declaration
    intercept[IllegalArgumentException] {
      Layout.snapshotAppendSpec(spark, root + "2", df, "days(cat)")
    }
  }

  test("SQL: CREATE PARTITIONED BY (days(ts), bucket(8, k)) — temporal ranges and key equality both prune files") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gpt.dt (k BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(8, k))")
    assert(Layout.snapshotMeta(spark, s"$wh/dt").header
      .get("partSpec").contains("days(ts),bucket(8,k)"))
    // three single-day inserts → day-localized files
    for (day <- 1 to 3) {
      (0 until 200).map(i => (day * 1000L + i,
          ts(f"2024-03-0$day ${i % 24}%02d:00:00"), i / 2.0))
        .toDF("k", "ts", "v").createOrReplaceTempView("dt_src")
      sql("INSERT INTO gpt.dt SELECT * FROM dt_src")
    }
    val total = Layout.snapshotMeta(spark, s"$wh/dt").paths
      .count(_ => true)
    assert(total >= 3, s"need >=3 files, got $total")
    // temporal slice: one day of three → prunes through days(ts)
    val q = sql("SELECT k, v FROM gpt.dt WHERE " +
      "ts >= TIMESTAMP '2024-03-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-03-03 00:00:00'")
    assert(q.collect().length == 200)
    val scans = graftScans(q)
    assert(scans.nonEmpty && scans.forall(_.lastPlannedFiles < total),
      s"day slice must prune: ${scans.map(_.lastPlannedFiles)} of $total")
    // correctness vs the unpruned engine read
    val direct = Layout.readSnapshot(spark, s"$wh/dt")
      .filter(col("ts") >= lit("2024-03-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-03-03 00:00:00").cast("timestamp"))
      .select("k", "v")
    assert(q.exceptAll(direct).isEmpty && direct.exceptAll(q).isEmpty)
    // day equality composed with bucket equality prunes at least as hard
    val q2 = sql("SELECT k, v FROM gpt.dt WHERE k = 2042 AND " +
      "ts >= TIMESTAMP '2024-03-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-03-03 00:00:00'")
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(2042L))
    val s2 = graftScans(q2)
    assert(s2.forall(_.lastPlannedFiles <=
      scans.map(_.lastPlannedFiles).max))
  }

  test("bucket pruning: a value-localized layout answers key equality from a file subset") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-ptbucket").toString + "/t"
    // shuffleByPartition routes rows by bucket hash → each file holds a
    // strict subset of the 8 buckets
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Layout.snapshotAppendSpec(spark, root,
      (0 until 800).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      "bucket(8,k)")
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", saved)
    val total = Layout.snapshotMeta(spark, root).paths.size
    assert(total >= 2, s"need >=2 files, got $total")
    val (df, index) = Layout.snapshotTableWithIndex(spark, root)
    val q = df.filter(col("k") === 137L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v137"))
    assert(index.lastListedFiles < total,
      s"bucket equality must prune: ${index.lastListedFiles} of $total")
  }

  test("streaming epoch commits record partSpec dims and ndv synopses (shared entry pass)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-pt-epoch").toString + "/t"
    // declare the layout + statistics on the first (batch) commit
    Layout.snapshotAppendSpec(spark, root,
      Seq((1L, ts("2024-06-01 08:00:00"), "a"))
        .toDF("k", "ts", "g"),
      "days(ts)", ndvKey = Some("g"))
    // the exactly-once streaming path appends epochs; its entries ride
    // the SAME commit pass, so dims + synopses must record without any
    // sink-side configuration
    Layout.snapshotAppendEpoch(spark, root,
      Seq((2L, ts("2024-06-02 09:00:00"), "b"),
        (3L, ts("2024-06-02 10:00:00"), "b"))
        .toDF("k", "ts", "g"),
      epoch = 100L, writerId = "w1", appendToExisting = true)
    val rows = Layout.snapshotFilesTable(spark, root)
      .select("partitions", "ndv").collect()
    val day2 = (ts("2024-06-02 00:00:00").getTime / 86400000L).toString
    assert(rows.exists(r =>
      r.getSeq[String](0).contains(s"0:$day2") &&
        r.getMap[String, Long](1).get("g").contains(1L)),
      s"the epoch commit's file must carry its day dim and g synopsis: " +
        rows.map(r => (r.getSeq[String](0), r.getMap[String, Long](1)))
          .mkString("; "))
  }

  test("a WIDE static IN (InSet past the optimizer threshold) still prunes through the transform") {
    wh
    import spark.implicits._
    // 6 single-day appends, then an IN of 20 timestamps (> the
    // spark.sql.optimizer.inSetConversionThreshold default of 10, so
    // the optimizer rewrites it to InSet with INTERNAL values) covering
    // only day 3 — the pruner must normalize InSet back to IN or the
    // probe proves nothing and every file stays (the q104 sf1 ladder
    // caught exactly that)
    for (day <- 1 to 6) {
      Layout.snapshotAppendSpec(spark, s"$wh/wide",
        (0 until 100).map(i => (day * 100L + i,
            ts(f"2024-07-0$day ${i % 24}%02d:00:00"), i * 1.0))
          .toDF("k", "ts", "v").coalesce(1), "days(ts)",
        shuffleByPartition = false)
    }
    val total = Layout.snapshotMeta(spark, s"$wh/wide").paths.size
    assert(total >= 6)
    val probes = (0 until 20).map(h =>
      f"TIMESTAMP '2024-07-03 ${h % 24}%02d:00:00'").mkString(",")
    val q = sql(s"SELECT k FROM gpt.wide WHERE ts IN ($probes)")
    val n = q.collect().length
    // day 3's rows have hour i % 24; the probes cover hours 0..19:
    // 4 full cycles × 20 + the tail 96..99 (hours 0..3) = 84
    assert(n == 84, s"sanity: got $n")
    val scans = graftScans(q)
    assert(scans.nonEmpty && scans.forall(_.lastPlannedFiles == 1),
      s"a wide IN covering one day must plan ONE file: " +
        s"${scans.map(_.lastPlannedFiles)} of $total")
  }

  test("DPP prunes when the DIM side is itself a graft table (broadcast reuse across DSv2 scans)") {
    wh
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Layout.snapshotAppendSpec(spark, s"$wh/gdppf",
      (0 until 800).map(i => (i.toLong,
        ts(f"2024-05-0${i % 4 + 1} 12:00:00"), i / 2.0))
        .toDF("k", "ts", "v"),
      "days(ts)")
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", saved)
    val factFiles = Layout.snapshotMeta(spark, s"$wh/gdppf").paths.size
    assert(factFiles >= 2, s"need multiple fact files, got $factFiles")
    // the dim is a GRAFT table: the DPP subquery's dim scan and the
    // join's dim scan are two DSv2 scan instances, and AQE reuses the
    // broadcast between them ONLY if the scans' Batch objects compare
    // equal — an identity-equal anonymous Batch silently downgraded
    // every graft-dim star join to an unpruned fact scan
    Layout.snapshotAppend(spark, s"$wh/gdppd",
      (1 to 4).map(d => (ts(s"2024-05-0$d 12:00:00"),
        if (d == 3) "keep" else "drop")).toDF("dts", "attr"))
    val q = sql("SELECT f.k FROM gpt.gdppf f " +
      "JOIN gpt.gdppd d ON f.ts = d.dts WHERE d.attr = 'keep'")
    val rows = q.collect()
    assert(rows.length == 200 && rows.forall(_.getLong(0) % 4 == 2))
    val scans = graftScans(q)
    assert(scans.nonEmpty)
    assert(scans.exists(s => s.lastPlannedFiles < factFiles),
      s"DPP with a graft dim must prune the fact: " +
        s"${scans.map(s => s"${s.lastPlannedFiles}")} of $factFiles\n" +
        q.queryExecution.executedPlan)
  }

  test("runtime filtering (DPP) prunes through a days(ts) transform on the fact") {
    wh
    import spark.implicits._
    // fact partitioned by days(ts): 4 days, value-localized files
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Layout.snapshotAppendSpec(spark, s"$wh/dppf",
      (0 until 800).map(i => (i.toLong,
        ts(f"2024-04-0${i % 4 + 1} 12:00:00"), i / 2.0))
        .toDF("k", "ts", "v"),
      "days(ts)")
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", saved)
    val factFiles = Layout.snapshotMeta(spark, s"$wh/dppf").paths.size
    assert(factFiles >= 2, s"need multiple fact files, got $factFiles")
    // file-backed dim so the selective predicate survives to runtime
    val dimDir = java.nio.file.Files
      .createTempDirectory("gpt-dim").toString
    (1 to 4).map(d => (ts(s"2024-04-0$d 12:00:00"),
        if (d == 2) "keep" else "drop"))
      .toDF("dts", "attr").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("gpt_dim")
    val q = sql("SELECT f.k FROM gpt.dppf f " +
      "JOIN gpt_dim d ON f.ts = d.dts WHERE d.attr = 'keep'")
    val rows = q.collect()
    assert(rows.length == 200 && rows.forall(_.getLong(0) % 4 == 1))
    val scans = graftScans(q)
    assert(scans.nonEmpty, "expected a GraftScan under the join")
    assert(scans.exists(s => s.lastPlannedFiles < factFiles),
      s"DPP through days(ts) must prune: " +
        s"${scans.map(_.lastPlannedFiles)} of $factFiles\n" +
        q.queryExecution.executedPlan)
  }
}
