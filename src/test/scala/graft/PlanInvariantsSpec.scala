package graft

import org.apache.spark.sql.functions._

/** Plan-level regression guards over the WHOLE query suite: the properties
  * that make these plans survive 100 TB are asserted, not just narrated.
  */
object PlanInvariantsSpec {
  /** Queries where a nested-loop/cartesian shape is the INTENDED plan:
    * each joins a bounded side (literal bands, a broadcast query set, a
    * 1-row aggregate) under a non-equi or constant-true condition.
    * Shared by the invariants suite and the full-surface PlanLint gate.
    */
  val intendedNestedLoop = Set(
    "q19_range_join", // 4-row literal bands, non-equi range predicate
    "q37_above_avg_inactive", // 1-row global average, constant-true join
    "s1_cosine_topk", // bounded broadcast query set, =!= predicate
    "s5_ann_pq", // bounded broadcast query set over PQ codes, =!= predicate
    "s16_ann_sq8", // bounded broadcast query set over SQ8 codes, =!= predicate (s5's shape)
    "s17_mmr_rerank", // bounded broadcast query set for the shortlist, =!= predicate (s1's shape)
    "t5_surprisal", // 1-row corpus total cross-joined into freqs
    "t17_lm_score", // 1-row (N, V) reference-totals aggregate crossed into the backoff term
    "a5_temperature_mix", // 1-row min-count aggregate crossed into rates
    "q52_value_share", // 1-row (total, nparts) aggregate crossed into the filter
    "q55_top_revenue_supplier", // 1-row max-revenue aggregate crossed into the filter
    "s9_ivf_stats", // 1-row corpus-total aggregate crossed into the 16-row share calc
    "t13_bm25_search", // 1-row (N, avgdl) stats aggregate crossed into the tf rows
    "t15_tfidf_keywords", // 1-row n_docs aggregate crossed into the tf⋈df rows
    "t14_collocations", // 1-row (n, nb) totals aggregate crossed into the survivors
    "m5_feature_retrieval" // bounded broadcast query set, =!= predicate (s1's shape)
  )
}

class PlanInvariantsSpec extends GraftSuite {
  import PlanInvariantsSpec.intendedNestedLoop

  test("no unintended CartesianProduct/BroadcastNestedLoopJoin in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (intendedNestedLoop(name)) None
        else {
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct") ||
              plan.contains("BroadcastNestedLoopJoin")) Some(name)
          else None
        }
    }
    assert(offenders.isEmpty,
      s"unintended nested-loop/cartesian plans: $offenders")
  }

  test("every no-partition window's input is bounded, suite-wide (offset tables, not data)") {
    // A WindowExec without PARTITION BY moves its whole input to one
    // partition — fatal on data, fine on a bands/strata-scale offset
    // table. This turns the sweep's single-partition warnings into
    // evidence: for EVERY query, each no-partition logical Window's
    // child is executed standalone and must stay under the offset-table
    // budget (far above any bands×sources table, far below the corpus).
    val Budget = 4096L
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val windows = plan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        windows.flatMap { w =>
          val n = org.apache.spark.sql.GraftDatasetBridge
            .ofRows(spark, w.child).count()
          if (n > Budget) Some(s"$name: no-partition window over $n rows")
          else None
        }
    }
    assert(offenders.isEmpty,
      s"no-partition windows over unbounded inputs: $offenders")
  }

  test("q2's filters and projection reach the parquet scan") {
    val plan = ops.Relational.q2FilterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []"),
      s"expected pushed filters in scan:\n$plan")
  }

  test("q5 plans as TakeOrderedAndProject (no global sort)") {
    val plan = ops.Relational.q5SortLimit(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q21 plans the partial-then-final WindowGroupLimit rewrite") {
    val plan = ops.Relational.q21TopKPerGroup(spark, sf)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$plan")
  }

  test("runtime bloom-filter pruning injects into a selective fact-fact join") {
    // At 100 TB a selective dim filter should prune the fact scan through a
    // runtime bloom filter (semi-join reduction). Thresholds are lowered so
    // the tiny test tables qualify; the assertion is that the optimizer
    // actually injects BloomFilterMightContain on the probe side.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation side must be SMALLER than its threshold (default 10MB —
      // fine); application side must be LARGER than its scan threshold
      // (default 10GB — lower it so the test fact table qualifies)
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders")
          .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.toLowerCase.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n$optimized")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q49's bucketed join plans with zero exchange and zero sort in a FRESH session") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // a fresh session (default confs): bucketedTable itself must arrange
    // the sort-elimination conf — a mis-configured cluster would otherwise
    // silently degrade into per-query sorts
    val s2 = spark.newSession()
    // force SMJ so the assertion is about bucketing, not broadcast luck;
    // AQE off so the static plan is inspectable (it wraps everything in
    // AdaptiveSparkPlanExec otherwise)
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "32")
    val df = ops.Relational.q49BucketedJoin(s2, sf)
    val smjs = df.queryExecution.executedPlan.collect {
      case j: SortMergeJoinExec => j
    }
    assert(smjs.nonEmpty, "expected a SortMergeJoin over the bucketed scans")
    smjs.foreach { j =>
      val bad = j.collect {
        case e: ShuffleExchangeExec => e.getClass.getSimpleName
        case s: SortExec => s.getClass.getSimpleName
      }
      assert(bad.isEmpty,
        s"bucketed+sorted scans must feed the join directly, found: $bad\n$j")
    }
    assert(df.count() > 0)
  }

  test("generated code for the graft expressions compiles (no silent fallback)") {
    // CODEGEN_ONLY + fallback off: a broken doGenCode throws instead of
    // quietly interpreting — guards DotProductExpr/HammingExpr/
    // HyperplaneBucketExpr's generated loops.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = Tables(spark, sf, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val dot = e.select(functions.dot(col("v"), col("v")).as("d"))
        .agg(sum(col("d"))).head().getDouble(0)
      assert(dot > 0)
      val bucket = e.select(
          functions.hyperplaneBucket(col("v"), 4, 64, 0).as("b"))
        .agg(countDistinct(col("b"))).head().getLong(0)
      assert(bucket > 1)
      val docs = Tables(spark, sf, "documents")
      val ham = docs.select(
          functions.simHashBits(col("text"), 16).as("s1"),
          functions.simHashBits(concat(col("text"), lit(" x")), 16).as("s2"))
        .select(functions.hamming(col("s1"), col("s2")).as("h"))
        .agg(sum(col("h"))).head().getLong(0)
      assert(ham >= 0)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }
}

/** PlanLint — the suite's plan invariants as a LIBRARY feature. */
class PlanLintSpec extends GraftSuite {
  import graft.plans.PlanLint

  test("lint flags a cartesian join and an allowlist silences it") {
    val a = Tables(spark, sf, "nation")
    val b = Tables(spark, sf, "region")
    val cross = a.crossJoin(b)
    val f = PlanLint.lint(cross)
    assert(f.exists(_.rule == "cartesian"), s"expected cartesian finding: $f")
    assert(PlanLint.lint(cross, allow = Set("cartesian"))
      .forall(_.rule != "cartesian"))
    intercept[IllegalStateException] { PlanLint.require(cross) }
  }

  test("lint flags an unpushed pushable filter; a pushed parquet filter is clean") {
    val good = Tables(spark, sf, "orders").filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"))
    assert(!PlanLint.lint(good).exists(_.rule == "unpushed-filter"),
      s"pushed filter must not flag: ${PlanLint.lint(good)}")
    // the text source supports no pushdown: the same pushable shape
    // (attribute < literal) decodes every row — exactly the smell
    val dir = java.nio.file.Files.createTempDirectory("graft-lint").toString
    Tables(spark, sf, "orders").select(col("o_orderkey").cast("string"))
      .write.mode("overwrite").text(s"$dir/t")
    val bad = spark.read.text(s"$dir/t").filter(col("value") < "100")
    assert(PlanLint.lint(bad).exists(_.rule == "unpushed-filter"),
      s"expected unpushed-filter: ${PlanLint.lint(bad)}\n" +
        bad.queryExecution.sparkPlan.toString)
    // parquet with pushdown DISABLED in the session: the conf-misconfig
    // case the advisory PushedFilters string cannot reveal
    val off = spark.newSession()
    off.conf.set("spark.sql.parquet.filterPushdown", "false")
    val confBad = off.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") < 100).select(col("o_orderkey"))
    assert(PlanLint.lint(confBad).exists(_.rule == "unpushed-filter"),
      s"expected unpushed-filter under disabled pushdown: ${PlanLint.lint(confBad)}")
  }

  test("lint flags a wide scan; a narrow projection is clean") {
    val wide = Tables(spark, sf, "lineitem") // 16 columns
    assert(PlanLint.lint(wide, wideScanColumns = 10).exists(_.rule == "wide-scan"))
    val narrow = wide.select(col("l_orderkey"), col("l_quantity"))
    assert(PlanLint.lint(narrow, wideScanColumns = 10).isEmpty,
      s"narrow scan must be clean: ${PlanLint.lint(narrow, wideScanColumns = 10)}")
  }

  test("the headline queries lint clean under the suite's allowlist") {
    for (name <- Seq("q1_agg", "q3_join_agg", "q47_bucket_range_join",
        "d2_minhash_lsh", "t15_tfidf_keywords")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val f = PlanLint.lint(df,
        allow = Set("cartesian").filter(_ => intendedNestedLoopNames(name)))
      assert(f.isEmpty, s"$name: $f")
    }
  }

  private val intendedNestedLoopNames =
    Set("t15_tfidf_keywords") // 1-row n_docs aggregate crossed in (see allowlist above)

  /** The WHOLE surface lints clean: every SparkEntry query runs through
    * all three rules. Allowlists are per-query and justified inline —
    * the repo's own plan invariants become a regression gate, so a new
    * query with a forgotten projection or an accidental nested loop
    * fails CI here, not in a 100 TB run. wideScanColumns=12 is tight
    * enough to catch a missing projection on every test table (lineitem,
    * the widest, has 16 columns).
    */
  test("all SparkEntry queries lint clean under per-query allowlists") {
    val allowByQuery: Map[String, Set[String]] =
      PlanInvariantsSpec.intendedNestedLoop.map(_ -> Set("cartesian")).toMap
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sf)
        PlanLint.lint(df, allow = allowByQuery.getOrElse(name, Set.empty),
          wideScanColumns = 12)
          .map(f => s"$name: [${f.rule}] ${f.detail}")
    }
    assert(findings.isEmpty,
      s"plan lint findings:%n${findings.mkString("; ")}")
  }
}
