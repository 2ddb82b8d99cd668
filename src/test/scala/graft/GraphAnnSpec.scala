package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** s20 graph-traversal ANN (the HNSW tier): recall floor vs the exact
  * s1 baseline, bounded beam, deterministic traversal.
  */
class GraphAnnSpec extends GraftSuite {

  test("s20 beam search meets the recall floor vs exact s1 and returns full top-k") {
    val exact = Similarity.s1CosineTopK(spark, sf)
      .select(col("q_id"), col("neighbor_id"))
    val ann = Similarity.s20GraphAnn(spark, sf)
    val got = ann.select(col("q_id"), col("neighbor_id"))
    assert(ann.count() == Similarity.NQueries * Similarity.TopK,
      "every query must fill its top-k from the final beam")
    val hit = got.join(exact, Seq("q_id", "neighbor_id")).count().toDouble
    val recall = hit / exact.count()
    info(f"s20 recall vs s1: $recall%.3f")
    assert(recall >= 0.6,
      f"graph ANN recall $recall%.3f below floor 0.6 — raise beam/hops")
  }

  test("s20 traversal is deterministic run-to-run") {
    val a = Similarity.s20GraphAnn(spark, sf).collect().toSeq
    val b = Similarity.s20GraphAnn(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("s20 edges are symmetric and degree-bounded") {
    val edges = Similarity.s20Edges(spark, sf)
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    assert(edges.exceptAll(rev).isEmpty, "symmetrized graph must be undirected")
    // each directed kNN edge contributes at most two undirected rows, so
    // the AVERAGE degree is ≤ 2k (hubs can exceed it; the mean cannot)
    val nodes = edges.select(col("src")).distinct().count()
    assert(edges.count() <= 2L * Similarity.S15K * nodes,
      "edge count must stay within the 2k-per-node kNN budget")
  }

  test("s21 beam tuner: recall is monotone in beam width, the chosen beam is the cheapest meeting target, the curve tops out at s20's operating point") {
    val beams = Seq(2, 4, Similarity.S20Beam)
    val r = Similarity.s21BeamTune(spark, sf,
      targetRecall = 0.5, beams = beams)
    assert(r.sweep.map(_.beam) == beams.sorted)
    // monotone non-decreasing: a wider beam keeps a superset per hop
    r.sweep.sliding(2).foreach { case Seq(a, b) =>
      assert(b.recall >= a.recall - 1e-12,
        s"recall must not drop with a wider beam: $a -> $b")
    }
    // the chosen point is the SMALLEST beam meeting the target
    val firstOk = r.sweep.find(_.recall >= 0.5)
    assert(firstOk.contains(BeamTunePointOf(r)),
      s"chosen ${r.beam}@${r.recall} must be the first point >= target " +
        s"in ${r.sweep}")
    // at s20's own beam the tuner reproduces s20's measured recall floor
    val top = r.sweep.last
    assert(top.beam == Similarity.S20Beam && top.recall >= 0.6,
      s"the widest point must match s20's recall floor, got $top")
    // an unreachable target falls back to the widest (best) point
    val hard = Similarity.s21BeamTune(spark, sf,
      targetRecall = 1.01, beams = Seq(2, 4))
    assert(hard.beam == 4 && hard.sweep.size == 2)
  }

  private def BeamTunePointOf(r: Similarity.BeamTuneResult) =
    Similarity.BeamTunePoint(r.beam, r.recall)
}
