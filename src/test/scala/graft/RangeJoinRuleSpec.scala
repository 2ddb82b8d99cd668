package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BucketedRangeJoinRule: the optimizer must turn a natural range
  * theta-join into a bucketed equi-join (no nested loop) without changing
  * its result — including boundary and null cases.
  */
class RangeJoinRuleSpec extends GraftSuite {

  private val rule = plans.BucketedRangeJoinRule(spark)

  private def probe: DataFrame = Tables(spark, sf, "orders")
    .select(col("o_orderkey"), col("o_totalprice"))
  private def intervals: DataFrame = Tables(spark, sf, "part")
    .select(col("p_partkey"), (col("p_retailprice") * 50).as("lo"),
      (col("p_retailprice") * 50 + 2000).as("hi"))

  private def natural: DataFrame = probe.join(intervals,
    col("o_totalprice") >= col("lo") && col("o_totalprice") <= col("hi"))

  private def withRule[A](width: Long)(f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    spark.conf.set(rule.WidthConf, width.toString)
    try f finally {
      spark.conf.unset(rule.WidthConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("rewrites the nested-loop range join to an equi-join with identical results") {
    val expected = natural.collect().toSet // rule not installed
    assert(expected.nonEmpty, "test join must match something")
    withRule(1000) {
      val df = natural
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"range join must not plan a nested loop under the rule:\n$plan")
      assert(plan.contains("Generate"),
        s"expected the interval-side bucket explode:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
        s"expected an equi join on the bucket:\n$plan")
      assert(df.collect().toSet === expected)
    }
  }

  test("strict bounds and flipped operand order are recognized too") {
    // def, not val: a Dataset pins its QueryExecution at creation, so it
    // must be rebuilt after the rule is installed to see the rewrite
    def flipped = probe.join(intervals,
      col("lo") < col("o_totalprice") && col("hi") > col("o_totalprice"))
    val expected = flipped.collect().toSet
    assert(expected.nonEmpty, "flipped-bounds join must match something")
    withRule(500) {
      val df = flipped
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(df.collect().toSet === expected)
    }
  }

  test("null bounds and null probe values drop out exactly as in the theta-join") {
    import spark.implicits._
    val p = Seq((1L, java.lang.Double.valueOf(5.0)), (2L, null.asInstanceOf[java.lang.Double]))
      .toDF("pid", "v")
    val iv = Seq((10L, java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(10.0)),
      (11L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(10.0)))
      .toDF("iid", "lo", "hi")
    def theta = p.join(iv, col("v") >= col("lo") && col("v") <= col("hi"))
    val expected = theta.collect().toSet
    assert(expected.map(_.getLong(0)) === Set(1L)) // only the non-null pair
    withRule(3) {
      val df = theta // rebuilt under the rule — plan must be rewritten
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      assert(df.collect().toSet === expected)
    }
  }

  test("fuzz: rule ≡ nested loop over random data incl. negative ranges and widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (round <- 1 to 3) {
      val probe = Seq.fill(300)((rnd.nextInt(100000).toLong,
        rnd.nextDouble() * 2000 - 1000)).toDF("pid", "v")
      // ~1 in 4 intervals INVERTED (lo > hi): matches nothing under the
      // theta-join and must not crash the rewritten plan (sequence() throws
      // on start > stop without the If guard)
      val iv = Seq.fill(80) {
        val lo = rnd.nextDouble() * 1800 - 900
        val span = rnd.nextDouble() * 300 - (if (rnd.nextInt(4) == 0) 400 else 0)
        (rnd.nextInt(100000).toLong, lo, lo + span)
      }.toDF("iid", "lo", "hi")
      def theta = probe.join(iv, col("v") >= col("lo") && col("v") <= col("hi"))
      val expected = theta.collect().toSet
      assert(expected.nonEmpty, s"round $round fuzz draw matched nothing")
      val width = Seq(7L, 100L, 5000L)(round - 1) // incl. width >> value span
      withRule(width) {
        val df = theta
        assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
          s"round $round: rule did not fire")
        assert(df.collect().toSet === expected, s"round $round, width $width")
      }
    }
  }

  test("timestamp bounds rewrite through epoch-micros bucketing (ANSI-safe)") {
    // events probed against [t, t + 2h) windows anchored at sampled event
    // times — the event-time range join every attribution pipeline runs.
    // Intervals derive from events (not orders: the tables' date ranges
    // don't overlap, which silently made an orders-anchored version of
    // this test vacuous — caught when the NTZ twin asserted nonEmpty)
    def evs = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"))
    def iv = Tables(spark, sf, "events").orderBy(col("event_id")).limit(50)
      .select(col("event_id").as("iv_id"), col("ts").as("w_lo"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_hi"))
    def theta = evs.join(iv, col("ts") >= col("w_lo") && col("ts") < col("w_hi"))
    val expected = theta.collect().toSet
    assert(expected.size >= 50, "degenerate: each interval must match its own anchor")
    withRule(3600L * 1000000) { // 1-hour buckets, in MICROSECONDS
      val df = theta
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_bucket"),
        s"timestamp range join must be rewritten:\n$plan")
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.collect().toSet === expected)
    }
  }

  test("TIMESTAMP_NTZ bounds rewrite through session-localized epoch bucketing") {
    // the type the current testdata drop infers without Tables.readerConfs
    // (parquet micros, isAdjustedToUTC=false): the rule localizes NTZ in
    // the session tz (UTC) before UnixMicros — monotone, so the bucket
    // rewrite stays exactly semantics-preserving
    def evs = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
    def iv = Tables(spark, sf, "events").orderBy(col("event_id")).limit(50)
      .select(col("event_id").as("iv_id"),
        col("ts").cast("timestamp_ntz").as("w_lo"),
        (col("ts") + expr("INTERVAL 2 HOURS")).cast("timestamp_ntz").as("w_hi"))
    def theta = evs.join(iv, col("ts") >= col("w_lo") && col("ts") < col("w_hi"))
    val expected = theta.collect().toSet
    assert(expected.nonEmpty, "degenerate NTZ case: no matches")
    withRule(3600L * 1000000) {
      val df = theta
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_bucket"),
        s"NTZ range join must be rewritten:\n$plan")
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.collect().toSet === expected)
    }
  }

  test("inverted and null-bounded intervals drop out instead of crashing sequence()") {
    import spark.implicits._
    val p = Seq((1L, 5.0), (2L, -3.0), (3L, 250.0)).toDF("pid", "v")
    val iv = Seq(
      (10L, java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(10.0)),   // normal: matches pid 1
      (11L, java.lang.Double.valueOf(500.0), java.lang.Double.valueOf(-500.0)), // inverted by many buckets
      (12L, java.lang.Double.valueOf(7.0), java.lang.Double.valueOf(6.0)),    // inverted within one bucket
      (13L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(3.0)))
      .toDF("iid", "lo", "hi")
    def theta = p.join(iv, col("v") >= col("lo") && col("v") <= col("hi"))
    val expected = theta.collect().toSet
    assert(expected.map(_.getLong(0)) === Set(1L))
    withRule(3) {
      val df = theta
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_bucket"),
        "rule did not fire")
      assert(df.collect().toSet === expected) // would throw ILLEGAL_SEQUENCE unguarded
    }
  }

  test("equi+range: bucket equality joins (key, bucket), results identical, fixpoint holds") {
    // the production shape: join on key AND ts within a per-key window —
    // the skewed equi key makes the per-key cross product the bottleneck
    // that bucketing within key partitions removes
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val probe = Seq.tabulate(400)(i =>
      (i % 3L, rnd.nextDouble() * 1000)).toDF("k", "v")
    val iv = Seq.fill(60) {
      val lo = rnd.nextDouble() * 900
      (rnd.nextInt(3).toLong, lo, lo + rnd.nextDouble() * 120)
    }.toDF("ik", "lo", "hi")
    def equiRange = probe.join(iv,
      col("k") === col("ik") && col("v") >= col("lo") && col("v") <= col("hi"))
    val expected = equiRange.collect().toSet
    assert(expected.nonEmpty)
    withRule(50) {
      val df = equiRange
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_bucket"),
        s"equi+range join must be rewritten:\n$opt")
      // fixpoint: optimizedPlan materialized = the batch ran to fixpoint
      // without blowing the iteration limit; exactly the two sentinel-form
      // Generates appear (probe pair-copy + interval buckets), not four
      assert("Generate".r.findAllIn(opt).size === 2, s"rule fired twice:\n$opt")
      assert(df.collect().toSet === expected)
    }
  }

  test("equi+range: too-wide intervals route through the sentinel fallback, exactly") {
    // narrow, wide, inverted, and null-bounded intervals mixed on a skewed
    // key — the wide ones must degrade to the per-key hash path (the
    // pre-rewrite behavior) instead of raising the maxSpan error
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val probe = Seq.tabulate(300)(i =>
      (i % 4L, rnd.nextDouble() * 1000)).toDF("k", "v")
    val iv = (Seq.fill(40) {
      val lo = rnd.nextDouble() * 900
      (rnd.nextInt(4).toLong, java.lang.Double.valueOf(lo),
        java.lang.Double.valueOf(lo + rnd.nextDouble() * 100))
    } ++ Seq(
      (0L, java.lang.Double.valueOf(-1e6), java.lang.Double.valueOf(1e6)),   // wide: 2e5 buckets >> cap
      (1L, java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(999999.0)), // wide
      (2L, java.lang.Double.valueOf(800.0), java.lang.Double.valueOf(-800.0)), // inverted
      (3L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(3.0))))
      .toDF("ik", "lo", "hi")
    def equiRange = probe.join(iv,
      col("k") === col("ik") && col("v") >= col("lo") && col("v") <= col("hi"))
    val expected = equiRange.collect().toSet
    assert(expected.nonEmpty)
    withRule(10) {
      spark.conf.set(rule.MaxSpanConf, "1000") // the ±1e6 intervals are wide
      try {
        val df = equiRange
        val opt = df.queryExecution.optimizedPlan.toString
        assert(opt.contains("__graft_probe_wide"),
          s"sentinel fallback must be in the plan:\n$opt")
        assert(df.collect().toSet === expected)
      } finally spark.conf.unset(rule.MaxSpanConf)
    }
  }

  test("equi+range with wideFallback off raises the named error, mentioning the conf") {
    import spark.implicits._
    val p = Seq((1L, 5.0)).toDF("k", "v")
    val iv = Seq((1L, 0.0, 1e12)).toDF("ik", "lo", "hi")
    def theta = p.join(iv,
      col("k") === col("ik") && col("v") >= col("lo") && col("v") <= col("hi"))
    withRule(1) {
      spark.conf.set(rule.WideFallbackConf, "false")
      try {
        val ex = intercept[Exception](theta.collect())
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(m => m.contains("graft range join") &&
          m.contains(rule.WideFallbackConf)),
          s"expected the named error naming the fallback conf, got: $ex")
      } finally spark.conf.unset(rule.WideFallbackConf)
    }
  }

  test("a span that overflows Long subtraction still trips the guard, not sequence()") {
    // bucket(lo) ≈ −9.2e18 and bucket(hi) ≈ 9.2e18: bHi − bLo wraps
    // negative in Long arithmetic, which would read as "narrow" and fall
    // into sequence()'s opaque boundary error — the double-space span test
    // must still classify it as wide and raise the NAMED error
    import spark.implicits._
    val p = Seq((1L, 5.0)).toDF("pid", "v")
    val iv = Seq((10L, -9.0e18, 9.0e18)).toDF("iid", "lo", "hi")
    def theta = p.join(iv, col("v") >= col("lo") && col("v") <= col("hi"))
    withRule(1) {
      val ex = intercept[Exception](theta.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("graft range join")),
        s"expected the named wide-interval error, got: $ex")
    }
  }

  test("an interval wider than maxSpan buckets fails loudly with a named error") {
    import spark.implicits._
    val p = Seq((1L, 5.0)).toDF("pid", "v")
    val iv = Seq((10L, 0.0, 1e12)).toDF("iid", "lo", "hi")
    def theta = p.join(iv, col("v") >= col("lo") && col("v") <= col("hi"))
    withRule(1) { // 1e12 buckets >> default 2^22 cap
      val ex = intercept[Exception](theta.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("graft range join")),
        s"expected the named wide-interval error, got: $ex")
      // with the cap disabled the row still fails, but inside sequence()
      spark.conf.set(rule.MaxSpanConf, "0")
      try intercept[Exception](theta.collect())
      finally spark.conf.unset(rule.MaxSpanConf)
    }
  }

  test("equi joins without a full (lo, hi) range triple are left untouched") {
    val equi = probe.join(intervals.withColumnRenamed("p_partkey", "o_orderkey"),
      Seq("o_orderkey")).filter(col("o_totalprice") >= col("lo"))
    withRule(1000) {
      val plan = equi.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bucket"),
        s"a lone lower bound must not be rewritten:\n$plan")
    }
    // width unset (0) => rule inert even on a pure range join
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      val plan = natural.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bucket"),
        s"rule must be off without the width conf:\n$plan")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq rule)
  }
}
