package graft

import org.apache.spark.sql.functions._

/** m7's round-18 contraction (CC over DISTINCT dhash values, labels
  * expanded back through the (doc_id, dhash) frame) must be
  * output-identical to the uncontracted form (labelClusters over m6's
  * full pair list) — the contraction exists because the full pair list
  * is quadratic in equal-hash clique sizes (measured 168.9 M pairs at
  * sf10) and its CC died of execution memory at that rung; it must be a
  * memory decision, never a semantic one.
  *
  * The fixture corpus plants same-length substitution copies
  * (m6Corpus's id+1000000 rows), so it exercises all three membership
  * classes: equal-hash groups (hamming-0 cliques), cross-value ≤τ
  * edges (the planted edits), and singleton hash values with no
  * neighbor (excluded from the output on both paths).
  */
class M7ContractionSpec extends GraftSuite {

  test("m7 contracted CC ≡ labelClusters over m6's full pair list") {
    val contracted = multimodal.Multimodal.m7PhashClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val full = dedup.Dedup.labelClusters(
        multimodal.Multimodal.m6PhashNearDup(spark, sf)
          .select(col("i"), col("j")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(contracted.nonEmpty, "fixture corpus must produce clusters")
    assert(contracted == full)
  }
}
