package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Layout

/** STORAGE-PARTITIONED JOINS: two graft tables partitioned on the join
  * key report KeyGroupedPartitioning from manifest metadata, and Spark
  * plans their join WITHOUT a shuffle on either side — at 100 TB the
  * single largest cost of a fact-fact join. Opt-in via Spark's own
  * `spark.sql.sources.v2.bucketing.enabled`; any file not provably
  * single-valued falls back to the normal shuffled plan.
  */
class StoragePartitionedJoinSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-spj").toString
    spark.conf.set("spark.sql.catalog.gspj",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  private def withSpj[T](on: Boolean)(body: => T): T = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", on.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange"))
  }

  private lazy val tables: Unit = {
    wh
    import spark.implicits._
    val a = (0 until 400).map(i => (i.toLong, s"g${i % 6}")).toDF("ka", "part")
    val b = (0 until 300).map(i => (i * 2L, s"g${i % 6}")).toDF("kb", "part")
    // value-pure files by construction: one single-value append per
    // partition value (a hash shuffle can co-locate two values in one
    // file, which correctly disqualifies SPJ — the fallback test below
    // covers that shape)
    for (v <- 0 until 6) {
      Layout.snapshotAppendPartitioned(spark, s"$wh/ta",
        a.filter(col("part") === s"g$v").coalesce(1), "part",
        shuffleByPartition = false)
      Layout.snapshotAppendPartitioned(spark, s"$wh/tb",
        b.filter(col("part") === s"g$v").coalesce(1), "part",
        shuffleByPartition = false)
    }
  }

  private val joinSql =
    """SELECT a.part, count(*) AS n, sum(a.ka + b.kb) AS s
      |FROM gspj.ta a JOIN gspj.tb b ON a.part = b.part
      |GROUP BY a.part""".stripMargin

  test("co-partitioned graft tables join with zero shuffles under SPJ") {
    tables
    val (spjPlanShuffles, spjRows) = withSpj(on = true) {
      val q = sql(joinSql)
      (shuffles(q), q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    }
    val (ctlShuffles, ctlRows) = withSpj(on = false) {
      val q = sql(joinSql)
      (shuffles(q), q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    }
    assert(spjRows == ctlRows, "SPJ must not change the answer")
    assert(ctlShuffles > 0, s"control plan should shuffle ($ctlShuffles)")
    // the JOIN itself is shuffle-free: only the final single-partition
    // aggregate exchange may remain
    assert(spjPlanShuffles < ctlShuffles,
      s"SPJ must remove join shuffles: $spjPlanShuffles vs $ctlShuffles")
  }

  test("the join itself plans no exchange below it under SPJ") {
    tables
    withSpj(on = true) {
      val q = sql("SELECT a.ka, b.kb, a.part FROM gspj.ta a " +
        "JOIN gspj.tb b ON a.part = b.part")
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
        s"expected a real join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"a pure co-partitioned join must plan ZERO exchanges:\n$plan")
    }
  }

  /** Value-localized bucket layouts, shared by the bucket tests (one
    * append per bucket keeps files single-bucket). A lazy fixture like
    * `tables`, so each test is order-independent.
    */
  private lazy val bucketTables: Unit = {
    wh
    import spark.implicits._
    val fa = (0 until 400).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val fb = (0 until 400).map(i => (i.toLong, i * 3.0)).toDF("k", "vb")
    for (b <- 0 until 8) {
      val inB = (c: org.apache.spark.sql.Column) =>
        pmod(xxhash64(c), lit(8)) === b
      Layout.snapshotAppendSpec(spark, s"$wh/ba",
        fa.filter(inB(col("k"))).coalesce(1), "bucket(8,k)",
        shuffleByPartition = false)
      Layout.snapshotAppendSpec(spark, s"$wh/bb",
        fb.filter(inB(col("k"))).coalesce(1), "bucket(8,k)",
        shuffleByPartition = false)
    }
  }

  test("BUCKETED SPJ: two tables bucketed bucket(8, k) join with no exchange below the join") {
    bucketTables
    val q = "SELECT a.k, a.va, b.vb FROM gspj.ba a " +
      "JOIN gspj.bb b ON a.k = b.k"
    val (spjShuffles, spjRows) = withSpj(on = true) {
      val df = sql(q)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), s"expected a join:\n$plan")
      (shuffles(df), df.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq)
    }
    val (ctlShuffles, ctlRows) = withSpj(on = false) {
      val df = sql(q)
      (shuffles(df), df.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq)
    }
    assert(spjRows == ctlRows && spjRows.length == 400,
      "bucketed SPJ must not change the answer")
    assert(ctlShuffles > 0 && spjShuffles == 0,
      s"bucket(8,k) co-partitioning must plan a shuffle-free join: " +
        s"spj=$spjShuffles control=$ctlShuffles")
  }

  test("TEMPORAL SPJ: two days(ts)-partitioned tables join on the raw timestamp with no exchange below the join") {
    wh
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-05-$d%02d 12:00:00")
    val fa = (0 until 240).map(i => (ts(i % 6 + 1), i.toLong))
      .toDF("t", "va")
    val fb = (0 until 180).map(i => (ts(i % 6 + 1), i * 10L))
      .toDF("t", "vb")
    // one append per day → single-day files
    for (d <- 1 to 6) {
      Layout.snapshotAppendSpec(spark, s"$wh/da",
        fa.filter(col("t") === ts(d)).coalesce(1), "days(t)",
        shuffleByPartition = false)
      Layout.snapshotAppendSpec(spark, s"$wh/db",
        fb.filter(col("t") === ts(d)).coalesce(1), "days(t)",
        shuffleByPartition = false)
    }
    val q = """SELECT a.t, count(*) AS n, sum(a.va + b.vb) AS s
              |FROM gspj.da a JOIN gspj.db b ON a.t = b.t
              |GROUP BY a.t""".stripMargin
    // temporal keyed layouts are their OWN opt-in (a keyed scan trades
    // away DPP — see GraftScan.keyedGroupsOf; task parallelism is kept
    // via per-split keyed partitions, pinned below)
    spark.conf.set("spark.graft.spj.temporal.enabled", "true")
    val (spjShuffles, spjRows) = try withSpj(on = true) {
      val df = sql(q)
      (shuffles(df), df.collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1.getTime).toSeq)
    } finally spark.conf.unset("spark.graft.spj.temporal.enabled")
    val (ctlShuffles, ctlRows) = withSpj(on = false) {
      val df = sql(q)
      (shuffles(df), df.collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1.getTime).toSeq)
    }
    assert(spjRows == ctlRows && spjRows.length == 6,
      "temporal SPJ must not change the answer")
    assert(ctlShuffles > spjShuffles,
      s"days(t) co-partitioning must remove the join shuffles: " +
        s"spj=$spjShuffles control=$ctlShuffles")
    // WITHOUT the opt-in, a days-partitioned table keeps DPP and normal
    // task parallelism even under the bucketing switch: the scan stays
    // un-keyed (the plan simply shuffles — exactness and pruning first)
    val unkeyed = withSpj(on = true) { shuffles(sql(q)) }
    assert(unkeyed > spjShuffles,
      "temporal keying must not engage without its own opt-in")
  }

  test("MULTI-DIM SPJ: two (bucket(4,k), days(t)) tables join on (k, t) with no exchange below the join") {
    wh
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-06-$d%02d 08:00:00")
    val fa = (0 until 240).map(i => (i.toLong, ts(i % 3 + 1), i * 2.0))
      .toDF("k", "t", "va")
    val fb = (0 until 240).map(i => (i.toLong, ts(i % 3 + 1), i * 3.0))
      .toDF("k", "t", "vb")
    // one append per (bucket, day) combination → files single-valued in
    // BOTH dims
    for (b <- 0 until 4; d <- 1 to 3) {
      val slice = (c: DataFrame) => c.filter(
        pmod(xxhash64(col("k")), lit(4)) === b && col("t") === ts(d))
      Layout.snapshotAppendSpec(spark, s"$wh/m2a",
        slice(fa).coalesce(1), "bucket(4,k),days(t)",
        shuffleByPartition = false)
      Layout.snapshotAppendSpec(spark, s"$wh/m2b",
        slice(fb).coalesce(1), "bucket(4,k),days(t)",
        shuffleByPartition = false)
    }
    val q = "SELECT a.k, a.t, a.va, b.vb FROM gspj.m2a a " +
      "JOIN gspj.m2b b ON a.k = b.k AND a.t = b.t"
    spark.conf.set("spark.graft.spj.temporal.enabled", "true")
    val (spjShuffles, spjRows) = try withSpj(on = true) {
      val df = sql(q)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), s"expected a join:\n$plan")
      (shuffles(df), df.collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1).toSeq)
    } finally spark.conf.unset("spark.graft.spj.temporal.enabled")
    val (ctlShuffles, ctlRows) = withSpj(on = false) {
      val df = sql(q)
      (shuffles(df), df.collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1).toSeq)
    }
    assert(spjRows == ctlRows && spjRows.length == 240,
      "multi-dim SPJ must not change the answer")
    assert(ctlShuffles > 0 && spjShuffles == 0,
      s"a compound (bucket, days) layout must plan a shuffle-free join: " +
        s"spj=$spjShuffles control=$ctlShuffles")
  }

  test("PARTIALLY-CLUSTERED SPJ: a side with many files per bucket keeps >1 task per key group, still zero exchanges") {
    wh
    import spark.implicits._
    val big = (0 until 2000).map(i => (i.toLong, i * 2.0)).toDF("k", "vl")
    val small = (0 until 200).map(i => (i.toLong, i * 3.0)).toDF("k", "vs")
    // the BIG side writes FOUR single-bucket files per bucket (16 files
    // over 4 buckets); the small side one per bucket
    for (b <- 0 until 4) {
      val inB = pmod(xxhash64(col("k")), lit(4)) === b
      for (s <- 0 until 4)
        Layout.snapshotAppendSpec(spark, s"$wh/pca",
          big.filter(inB && col("k") % 4 === s).coalesce(1), "bucket(4,k)",
          shuffleByPartition = false)
      Layout.snapshotAppendSpec(spark, s"$wh/pcb",
        small.filter(inB).coalesce(1), "bucket(4,k)",
        shuffleByPartition = false)
    }
    val q = "SELECT a.k, a.vl, b.vs FROM gspj.pca a " +
      "JOIN gspj.pcb b ON a.k = b.k"
    val extra = Seq(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
    val savedExtra = extra.map(k => k -> spark.conf.getOption(k))
    extra.foreach(spark.conf.set(_, "true"))
    try withSpj(on = true) {
      val df = sql(q)
      val rows = df.collect()
      assert(rows.length == 200, "answers stay exact")
      val plan = df.queryExecution.executedPlan
      assert(!plan.toString.contains("Exchange"),
        s"partially-clustered SPJ still plans zero exchanges:\n$plan")
      // the big side keeps its per-file tasks instead of collapsing to
      // one task per bucket — the parallelism the production form keeps
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => all(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => s +: all(s.plan)
        case other => other +: other.children.flatMap(all)
      }
      val scanParts = all(plan).collect {
        case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b.inputRDD.getNumPartitions
      }
      assert(scanParts.nonEmpty, s"expected BatchScanExec nodes:\n$plan")
      assert(scanParts.max > 4,
        s"the multi-file side must keep >1 task per key group " +
          s"(groups=4, tasks per scan=$scanParts)")
    } finally savedExtra.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("mismatched bucket counts fall back to the shuffled plan and stay exact") {
    bucketTables
    import spark.implicits._
    Layout.snapshotAppendSpec(spark, s"$wh/bc",
      (0 until 100).map(i => (i.toLong, s"x$i")).toDF("k", "vc"),
      "bucket(4,k)")
    withSpj(on = true) {
      val df = sql("SELECT a.k, c.vc FROM gspj.ba a " +
        "JOIN gspj.bc c ON a.k = c.k")
      val rows = df.collect()
      assert(rows.length == 100, "answers stay exact under the fallback")
    }
  }

  test("DPP on the NON-keyed dim of a compound spec: the bucket join stays zero-exchange while a date-dim filter cuts the planned files") {
    wh
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-06-$d%02d 08:00:00")
    val fa = (0 until 240).map(i => (i.toLong, ts(i % 3 + 1), i * 2.0))
      .toDF("k", "t", "va")
    val fb = (0 until 240).map(i => (i.toLong, ts(i % 3 + 1), i * 3.0))
      .toDF("k", "t", "vb")
    // one file per (bucket, day): 12 files each; WITHOUT the temporal
    // opt-in the scan keys on the bucket dim ALONE (partial keying) and
    // the days dim stays runtime-filterable
    for (b <- 0 until 4; d <- 1 to 3) {
      val slice = (c: DataFrame) => c.filter(
        pmod(xxhash64(col("k")), lit(4)) === b && col("t") === ts(d))
      Layout.snapshotAppendSpec(spark, s"$wh/m3a",
        slice(fa).coalesce(1), "bucket(4,k),days(t)",
        shuffleByPartition = false)
      Layout.snapshotAppendSpec(spark, s"$wh/m3b",
        slice(fb).coalesce(1), "bucket(4,k),days(t)",
        shuffleByPartition = false)
    }
    val factFiles = Layout.snapshotMeta(spark, s"$wh/m3a").paths.size
    assert(factFiles == 12)
    // file-backed dim (so the selective predicate survives to runtime);
    // broadcast hint keeps the dim join shuffle-free and gives DPP its
    // reusable broadcast
    val dimDir = java.nio.file.Files
      .createTempDirectory("gspj-dim").toString
    (1 to 3).map(d => (ts(d), if (d == 2) "keep" else "drop"))
      .toDF("dts", "attr").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("spj_dim")
    // the dim broadcast is hinted (DPP rides broadcast reuse) even
    // though withSpj disables auto-broadcast for the fact join
    val q = "SELECT /*+ BROADCAST(d) */ a.k, a.t, a.va, b.vb " +
      "FROM gspj.m3a a " +
      "JOIN gspj.m3b b ON a.k = b.k " +
      "JOIN spj_dim d ON a.t = d.dts WHERE d.attr = 'keep'"
    def graftScans(df: DataFrame): Seq[graft.sources.GraftScan] = {
      import org.apache.spark.sql.execution.SparkPlan
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          s +: walk(s.plan)
        case other => other +: (other.children.flatMap(walk) ++
          other.subqueries.flatMap(walk))
      }
      walk(df.queryExecution.executedPlan)
        .collect { case b: org.apache.spark.sql.execution.datasources
          .v2.BatchScanExec => b.scan }
        .collect { case g: graft.sources.GraftScan => g }
    }
    val (spjRows, spjShuffleEx, spjPlanned) = withSpj(on = true) {
      val df = sql(q)
      val rows = df.collect()
      val shuffleEx = df.queryExecution.executedPlan.toString.split("\n")
        .count(l => l.contains("Exchange") && !l.contains("Broadcast"))
      (rows.map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1).toSeq,
        shuffleEx, graftScans(df).map(_.lastPlannedFiles))
    }
    val ctlRows = withSpj(on = false) {
      sql(q).collect().map(r => (r.getLong(0), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    }
    assert(spjRows == ctlRows && spjRows.length == 80,
      "partial keying + DPP must not change the answer")
    assert(spjShuffleEx == 0,
      s"the bucket-keyed join must stay zero-exchange under DPP " +
        s"(got $spjShuffleEx shuffle exchanges)")
    assert(spjPlanned.exists(_ < factFiles),
      s"the date-dim DPP filter must cut the planned files within the " +
        s"bucket groups: $spjPlanned of $factFiles")
    // the day slice keeps 4 of 12 files (one per bucket)
    assert(spjPlanned.min <= 4,
      s"day=2 keeps one file per bucket: $spjPlanned")
  }

  test("a table with multi-value files falls back to the shuffled plan and stays exact") {
    tables
    import spark.implicits._
    // un-shuffled append: files span many partition values
    val c = (0 until 200).map(i => (i.toLong, s"g${i % 6}")).toDF("kc", "part")
    Layout.snapshotAppend(spark, s"$wh/tc", c)
    withSpj(on = true) {
      val q = sql("SELECT c.part, count(*) AS n FROM gspj.tc c " +
        "JOIN gspj.ta a ON c.part = a.part GROUP BY c.part")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // per part value: |c rows| * |a rows| pairs
      val aCnt = (0 until 400).groupBy(i => s"g${i % 6}").view.mapValues(_.size)
      val cCnt = (0 until 200).groupBy(i => s"g${i % 6}").view.mapValues(_.size)
      val want = cCnt.map { case (p, n) => p -> (n.toLong * aCnt(p)) }.toMap
      assert(got == want)
    }
  }
}
