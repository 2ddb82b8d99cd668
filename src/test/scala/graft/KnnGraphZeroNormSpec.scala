package graft

import org.apache.spark.sql.functions._

/** s15's zero-norm contract: a vector with ‖v‖ = 0 has no cosine direction,
  * so it is EXCLUDED from the kNN graph — as a node and as a neighbor —
  * rather than ranked by NaN. (Pre-round-17 the behavior was
  * ordering-dependent: the old window ranked NaN cosines first, the TopKAgg
  * rewrite ranks them last; the filter makes the output NaN-free and
  * independent of either.)
  */
class KnnGraphZeroNormSpec extends GraftSuite {

  test("zero-norm embedding is excluded from the kNN graph, output NaN-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zeronorm").toString
    val e = Tables(spark, sf, "embeddings")
    val dim = e.selectExpr("size(embedding)").head().getInt(0)
    val planted = 999999L
    e.limit(50)
      .unionAll(spark.range(1).select(lit(planted).as("vec_id"),
        array_repeat(lit(0f), dim).as("embedding"), lit(0).as("label")))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val g = similarity.Similarity.s15KnnGraph(spark, dir)
    assert(g.filter(col("q_id") === planted ||
      col("neighbor_id") === planted).count() === 0,
      "zero-norm vector must appear neither as node nor as neighbor")
    assert(g.filter(isnan(col("cos"))).count() === 0, "graph must be NaN-free")
    assert(g.count() > 0, "the remaining corpus still builds a graph")
  }
}
