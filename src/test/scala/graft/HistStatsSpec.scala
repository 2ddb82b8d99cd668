package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch
import graft.ops.Layout

/** Manifest HISTOGRAM statistics: per-file KLL-derived equi-height
  * boundaries for the declared `histKey` columns, merged at scan build
  * into the DSv2 histogram CBO's range FilterEstimation reads — closing
  * the estimation chain for the dominant `WHERE x BETWEEN` shape, which
  * NDV + null counts alone cannot price under skew (a range's
  * selectivity is a property of the value DISTRIBUTION).
  */
class HistStatsSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-hist").toString
    spark.conf.set("spark.sql.catalog.ghist",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ghist.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  private def hasBroadcast(df: DataFrame): Boolean = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(walk)
    walk(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastExchangeLike])
  }

  test("mergeEquiHeight: the merged boundaries track the true pooled quantiles across skewed per-file distributions") {
    // file A: uniform 0..999 (1000 rows); file B: uniform 10000..10999
    // (1000 rows); file C: constant 500 (2000 rows — a point mass)
    def bounds(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      (0 to QuantileSketch.HistBins).map { j =>
        sorted(math.min(sorted.length - 1,
          math.max(0, math.ceil(j.toDouble / QuantileSketch.HistBins *
            sorted.length).toInt - 1)))
      }
    }
    val a = (0 until 1000).map(_.toDouble)
    val b = (0 until 1000).map(i => 10000.0 + i)
    val c = Seq.fill(2000)(500.0)
    val merged = QuantileSketch.mergeEquiHeight(Seq(
      (bounds(a), 1000L), (bounds(b), 1000L), (bounds(c), 2000L)))
    assert(merged.length == QuantileSketch.HistBins + 1)
    val pooled = (a ++ b ++ c).sorted
    // each merged boundary must sit within 5% rank error of the true
    // pooled quantile; a repeated value occupies a rank INTERVAL
    // [count(<m), count(≤m)] — the target must fall inside it (±5%)
    (1 until QuantileSketch.HistBins).foreach { j =>
      val m = merged(j)
      val rankLo = pooled.count(_ < m).toDouble / pooled.length
      val rankHi = pooled.count(_ <= m).toDouble / pooled.length
      val want = j.toDouble / QuantileSketch.HistBins
      assert(want >= rankLo - 0.05 && want <= rankHi + 0.05,
        s"boundary $j=$m spans ranks [$rankLo, $rankHi], want ≈ $want")
    }
    // the point mass is visible: the median region pins at 500
    assert(merged(QuantileSketch.HistBins / 2) === 500.0)
  }

  test("histKey boundaries ride the manifest per file; the scan reports the merged histogram with min/max") {
    wh
    import spark.implicits._
    sql("CREATE TABLE ghist.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsKey'='k', 'histKey'='v')")
    // SKEW: 95% of rows in [0, 100), a 5% tail up to 1,000,000
    val n = 20000
    (0 until n).map { i =>
      val v = if (i % 20 == 19) 100L + (i.toLong * 50L) % 999900L
              else (i % 100).toLong
      (i.toLong, v)
    }.toDF("k", "v").createOrReplaceTempView("hist_src")
    sql("INSERT INTO ghist.t SELECT * FROM hist_src")
    sql("INSERT INTO ghist.t SELECT k + 20000, v FROM hist_src")
    val probe = new graft.sources.GraftScanBuilderProbe(spark, s"$wh/t")
    val Some((height, bins, mn, mx)) = probe.histogram("v")
    assert(bins.length == QuantileSketch.HistBins)
    assert(math.abs(height - 2.0 * n / QuantileSketch.HistBins) <
      2.0 * n / QuantileSketch.HistBins * 0.01,
      s"equi-height: height must be rows/bins, got $height")
    assert(mn.contains(0L) && mx.exists(_.asInstanceOf[Long] > 100000L),
      s"min/max from the boundary extremes: $mn / $mx")
    // the skew is captured: at least 90% of bins lie inside [0, 100)
    val lowBins = bins.count(_._2 < 100.0)
    assert(lowBins >= (QuantileSketch.HistBins * 9) / 10,
      s"95% of mass below 100 → ≥90% of equi-height bins there, " +
        s"got $lowBins of ${bins.length}")
    // SQL surface: CALL analyze with hist_cols backfills an undeclared
    // table and declares histKey
    sql("CREATE TABLE ghist.t2 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsKey'='k')")
    sql("INSERT INTO ghist.t2 SELECT k, v FROM hist_src")
    assert(new graft.sources.GraftScanBuilderProbe(spark, s"$wh/t2")
      .histogram("v").isEmpty)
    sql("CALL ghist.system.analyze('t2', 'v', 'v')")
    assert(new graft.sources.GraftScanBuilderProbe(spark, s"$wh/t2")
      .histogram("v").isDefined,
      "CALL analyze(hist_cols) must backfill the histogram")
  }

  test("the histogram flips a broadcast decision on a RANGE-filtered join side that NDV alone cannot price (CBO)") {
    wh
    import spark.implicits._
    // twin dims, identical SKEWED data: 95% of v in [0, 100), 5% tail —
    // da declares histKey, db only ndvKey (distinct count = the whole
    // story NDV can tell; a range's truth needs the distribution)
    val n = 40000
    for (t <- Seq("da", "db")) {
      sql(s"CREATE TABLE ghist.$t (k BIGINT, v BIGINT, g STRING) " +
        "TBLPROPERTIES ('statsKey'='k', " +
        (if (t == "da") "'histKey'='v', " else "") + "'ndvKey'='v')")
      (0 until n).map { i =>
        val v = if (i % 20 == 19) 100L + (i.toLong * 50L) % 999900L
                else (i % 100).toLong
        (i.toLong, v, s"grp${i % 64}")
      }.toDF("k", "v", "g").createOrReplaceTempView(s"${t}_src")
      sql(s"INSERT INTO ghist.$t SELECT * FROM ${t}_src")
    }
    sql("CREATE TABLE ghist.fact (g STRING, w DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='w')")
    (0 until 40000).map(i => (s"grp${i % 64}", i * 1.0)).toDF("g", "w")
      .createOrReplaceTempView("fact_src")
    sql("INSERT INTO ghist.fact SELECT * FROM fact_src")
    // the tail predicate: truth = 5% of the dim; the uniform/default
    // assumption grossly over-estimates it
    def joined(t: String): DataFrame = sql(
      s"""SELECT d.k, d.v, f.w FROM
         |  (SELECT * FROM ghist.$t WHERE v > 100) d
         |JOIN ghist.fact f ON d.g = f.g""".stripMargin)
    val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val savedThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // read the CBO's row estimates for the filtered side directly
      def filterEstimate(t: String): Option[BigInt] = {
        val plan = sql(s"SELECT * FROM ghist.$t WHERE v > 100")
          .queryExecution.optimizedPlan
        plan.stats.rowCount
      }
      val withHist = filterEstimate("da")
      val without = filterEstimate("db")
      val truth = n / 20
      assert(withHist.exists(rc => rc.toLong > truth / 3 &&
        rc.toLong < truth * 3),
        s"histogram estimate must be near the true 5% ($truth): $withHist")
      assert(without.forall(_.toLong > truth * 5),
        s"NDV-only estimate cannot see the skew (expected gross " +
          s"over-estimate or none): $without")
      // pick a threshold BETWEEN the two estimated sizes: the histogram
      // side broadcasts, the NDV-only twin must not — the flip isolates
      // the histogram as the deciding statistic
      val sizeWith = sql("SELECT * FROM ghist.da WHERE v > 100")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val sizeWithout = sql("SELECT * FROM ghist.db WHERE v > 100")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sizeWith < sizeWithout,
        s"histogram must shrink the size estimate: $sizeWith vs $sizeWithout")
      val thr = (sizeWith + (sizeWithout - sizeWith) / 2).min(
        BigInt(Long.MaxValue / 4)).toLong
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
      val a = joined("da")
      val b = joined("db")
      assert(a.collect().length == b.collect().length, "answers agree")
      assert(hasBroadcast(a),
        "range-filtered side with histogram → provably small → " +
          "broadcast:\n" + a.queryExecution.executedPlan)
      assert(!hasBroadcast(b),
        "same data without histogram must stay shuffle-joined:\n" +
          b.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", savedCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThr)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("CALL analyze(hist_cols) on a STAT-LESS legacy table flips the same broadcast decision the CREATE-declared histKey does") {
    wh
    import spark.implicits._
    // twin LEGACY tables: created with NO ndvKey and NO histKey — the
    // migration shape (data written before statistics were declared).
    // Identical skewed data; dc gets the ANALYZE backfill, dd stays
    // stat-less as the control.
    val n = 40000
    for (t <- Seq("dc", "dd")) {
      sql(s"CREATE TABLE ghist.$t (k BIGINT, v BIGINT, g STRING) " +
        "TBLPROPERTIES ('statsKey'='k')")
      (0 until n).map { i =>
        val v = if (i % 20 == 19) 100L + (i.toLong * 50L) % 999900L
                else (i % 100).toLong
        (i.toLong, v, s"grp${i % 64}")
      }.toDF("k", "v", "g").createOrReplaceTempView(s"${t}_src")
      sql(s"INSERT INTO ghist.$t SELECT * FROM ${t}_src")
    }
    sql("CREATE TABLE ghist.fact2 (g STRING, w DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='w')")
    (0 until 40000).map(i => (s"grp${i % 64}", i * 1.0)).toDF("g", "w")
      .createOrReplaceTempView("fact2_src")
    sql("INSERT INTO ghist.fact2 SELECT * FROM fact2_src")
    // the backfill: one distributed footer-and-data pass over the
    // EXISTING files — no rewrite — recording NDV sketches AND
    // equi-height boundaries, and declaring ndvKey/histKey so later
    // appends stay fresh
    sql("CALL ghist.system.analyze('dc', 'v', 'v')")
    def joined(t: String): DataFrame = sql(
      s"""SELECT d.k, d.v, f.w FROM
         |  (SELECT * FROM ghist.$t WHERE v > 100) d
         |JOIN ghist.fact2 f ON d.g = f.g""".stripMargin)
    val savedCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val savedThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val truth = n / 20
      val withHist = sql("SELECT * FROM ghist.dc WHERE v > 100")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(withHist.exists(rc => rc.toLong > truth / 3 &&
        rc.toLong < truth * 3),
        s"backfilled histogram must price the 5% tail ($truth): $withHist")
      val sizeWith = sql("SELECT * FROM ghist.dc WHERE v > 100")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val sizeWithout = sql("SELECT * FROM ghist.dd WHERE v > 100")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sizeWith < sizeWithout,
        s"the backfill must shrink the size estimate exactly as the " +
          s"declared path does: $sizeWith vs $sizeWithout")
      val thr = (sizeWith + (sizeWithout - sizeWith) / 2).min(
        BigInt(Long.MaxValue / 4)).toLong
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
      val a = joined("dc")
      val b = joined("dd")
      assert(a.collect().length == b.collect().length, "answers agree")
      assert(hasBroadcast(a),
        "ANALYZE-backfilled side → provably small under the range " +
          "filter → broadcast:\n" + a.queryExecution.executedPlan)
      assert(!hasBroadcast(b),
        "the stat-less twin must stay shuffle-joined:\n" +
          b.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", savedCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThr)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("ANALYZE backfills histograms on an existing table and histKey keeps them fresh on later appends") {
    wh
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-histan")
      .toString + "/t"
    (0 until 5000).map(i => (i.toLong, (i % 50).toDouble))
      .toDF("k", "v").repartition(3).write.mode("overwrite")
      .parquet("/tmp/graft-hist-src")
    Layout.snapshotAppend(spark,
      root, spark.read.parquet("/tmp/graft-hist-src"))
    // pre-ANALYZE: no histogram
    val probe = new graft.sources.GraftScanBuilderProbe(spark, root)
    assert(probe.histogram("v").isEmpty)
    Layout.snapshotAnalyze(spark, root, Seq("v"), histCols = Seq("v"))
    val Some((h1, bins1, _, _)) = probe.histogram("v")
    assert(bins1.length == QuantileSketch.HistBins && h1 > 0)
    // a later append re-records boundaries at commit time (histKey was
    // declared by ANALYZE) — the merged histogram still reports
    Layout.snapshotAppend(spark, root,
      (0 until 1000).map(i => (5000L + i, 200.0 + i)).toDF("k", "v"))
    val Some((h2, bins2, _, mx2)) = probe.histogram("v")
    assert(h2 > h1, "mass grew with the append")
    assert(mx2.exists(_.asInstanceOf[Double] > 150.0),
      s"the appended tail must widen the histogram: $mx2")
    assert(bins2.last._2 > 150.0)
  }
}
