package graft

import org.apache.spark.sql.functions._

/** Every SparkEntry query runs at sf0.001, is non-degenerate, and has the
  * aliased (oracle-matching) column names. Value-level parity vs DuckDB is
  * the driver's gate; these are fast structural invariants.
  */
class QueriesSpec extends GraftSuite {

  // Queries whose result is legitimately tiny/empty are exempt from rows>0.
  private val mayBeEmpty = Set.empty[String]

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and is non-degenerate at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.columns.forall(c => c == c.toLowerCase || c.nonEmpty))
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("no query name collides across family maps (Map ++ overwrites silently)") {
    val families = Seq(
      ops.Relational.all, text.TextOps.all, dedup.Dedup.all,
      similarity.Similarity.all, multimodal.Multimodal.all,
      streaming.EventStreams.all, pipeline.PipelineQueries.all,
      ops.Sampling.all, ops.Graph.all)
    // + st8_curated_mix, registered directly in SparkEntry (it lives in
    // Curation, whose object init cycles with EventStreams if put in the
    // EventStreams maps)
    val total = families.map(_.size).sum + 1
    assert(total == SparkEntry.queries.size,
      s"family maps hold $total entries but the merged registry has " +
        s"${SparkEntry.queries.size} — a duplicate key silently dropped a query")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

/** Semantics checks that don't depend on the DuckDB oracle. */
class OperatorSemanticsSpec extends GraftSuite {

  test("asof join picks the most recent order at-or-before the event") {
    val out = ops.AsOfJoin.eventsToOrders(spark, sf)
    val orders = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val joined = out.alias("a").join(orders.alias("o"),
      col("a.user_id") === col("o.o_custkey") &&
        col("o.o_orderdate") <= col("a.ts") &&
        col("o.o_orderdate") > col("a.o_orderdate"))
    // no order of the same user lies strictly between the match and the event
    assert(joined.count() === 0)
  }

  test("salted two-phase agg equals plain groupBy") {
    val salted = ops.Relational.q25SkewAgg(spark, sf)
    val plain = Tables(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"),
        countDistinct(col("event_type")).cast("int").as("n_types"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("top-k per group returns at most k per group") {
    val df = ops.Relational.q21TopKPerGroup(spark, sf)
    val over = df.groupBy(col("l_returnflag")).count().filter(col("count") > 3)
    assert(over.count() === 0)
  }

  test("q76 frontier-delta BFS ≡ naive Bellman-Ford relaxation") {
    // The shipped operator joins edges only against last round's newly
    // reached nodes; this re-derives the answer with the full-reached-set
    // relaxation it replaced and demands identical output.
    val fast = ops.Graph.q76BfsHops(spark, sf)
    val o = Tables(spark, sf, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = Tables(spark, sf, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val ed = e0.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(e0.select(col("s").as("src"), col("c").as("dst")))
      .localCheckpoint()
    var naive = Tables(spark, sf, "supplier")
      .filter(col("s_suppkey") % 3 === 0)
      .select((col("s_suppkey") * 2 + 1).as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (_ <- 1 to ops.Graph.MaxHops)
      naive = naive
        .unionAll(ed.join(naive, col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + 1L).as("dist")))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
  }

  test("q76 frontier drains: later rounds join a shrinking delta, not the reached set") {
    // The scale rationale made checkable: on the dense purchase graph the
    // frontier collapses after hop 2, so the delta the edge join sees in
    // rounds 3+ must be a small fraction of the reached set a naive
    // relaxation would re-join every round.
    val out = ops.Graph.q76BfsHops(spark, sf)
      .groupBy(col("dist")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reachedByHop2 = (0L to 2L).map(out.getOrElse(_, 0L)).sum
    val laterFrontiers = out.filter(_._1 > 2L).values.sum
    assert(reachedByHop2 > 0)
    assert(laterFrontiers < reachedByHop2 / 10,
      s"frontier after hop 2 is $laterFrontiers vs $reachedByHop2 reached — " +
        "delta loop should be joining ~nothing by then")
  }

  test("approx_count_distinct tracks exact within 5% on lineitem partkeys") {
    val li = Tables(spark, sf, "lineitem")
    val Array(approx, exact) = li.agg(
      approx_count_distinct(col("l_partkey")).cast("double"),
      countDistinct(col("l_partkey")).cast("double")).head().toSeq
      .map(_.asInstanceOf[Double]).toArray
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
