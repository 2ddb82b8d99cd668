package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A8: Count-Min sketch — the OVERCOUNT dual of Misra-Gries (A5), closing
  * the frequency-sketch pair: MG retains only the heavy items and
  * UNDERcounts (drop-biased); CMS answers a frequency query for ANY item
  * and OVERcounts (collision-biased). Production use: approximate
  * per-token / per-key frequency lookup over vocabulary-scale streams
  * where the full count table would not fit — dedup-rate telemetry,
  * n-gram count features, join-key skew probes.
  *
  * Structure: depth×width counter matrix; item x increments cell
  * (i, (a_i·h(x)+b_i) mod P mod width) per row i, with h = the portable
  * char-fold and (a_i, b_i) drawn exactly like [[MinHashSigExpr]]'s
  * permutation family (a_i = (i·2654435761+1) mod P, b_i = (i·40503+7)
  * mod P) — deterministic everywhere, so two sketches of the same
  * multiset are BIT-IDENTICAL regardless of partitioning or arrival
  * order (sketch construction is a commutative integer sum per cell).
  *
  * Guarantees asserted by CountMinSpec:
  *  - overcount-only (deterministic): estimate(x) ≥ true(x) for every x —
  *    each row's cell holds true(x) plus nonnegative collision mass;
  *  - merge linearity (deterministic): sketch(A ⊎ B) = sketch(A) +
  *    sketch(B) cell-for-cell — CMS is a linear projection of the count
  *    vector, the strongest mergeability there is (map-side partials are
  *    exact, any partitioning yields the same final sketch);
  *  - error bound: estimate(x) − true(x) ≤ ε·n at the spec's geometry
  *    (the textbook bound E[err] ≤ n/width per row, min over depth rows;
  *    asserted measured over every distinct token of the corpus).
  *
  * 100 TB: the buffer is depth·width longs (the spec geometry: 3×1024 =
  * 24 KiB) independent of input size; each partition folds its rows
  * locally and ships ONE buffer to the merge — same shuffle shape as any
  * partial aggregate. Query cost is depth cell reads.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  import PortableHash.P

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], item: String): Array[Long] = {
    if (item == null) return b // skip nulls like built-in aggregates
    val h = PortableHash.charFold(item)
    var i = 0
    while (i < depth) {
      val a = (i * 2654435761L + 1L) % P
      val bb = (i * 40503L + 7L) % P
      b(i * width + (((a * h + bb) % P) % width).toInt) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMinSketch {
  /** Spec/default geometry: ε = e/width ≈ 0.27%, δ = e^−3 ≈ 5%. */
  val Depth = 3
  val Width = 1024

  /** Column form: aggregate a string column into the flat depth×width
    * counter array.
    */
  def countMin(item: Column, depth: Int = Depth, width: Int = Width): Column =
    udaf(new CountMinAggregator(depth, width)).apply(item)

  /** Point-frequency query against a collected sketch (driver-side model
    * read, like interrogating any collected aggregate).
    */
  def estimate(sketch: Array[Long], item: String,
      depth: Int = Depth, width: Int = Width): Long = {
    require(sketch.length == depth * width,
      s"count-min geometry mismatch: sketch has ${sketch.length} cells, " +
        s"query assumes $depth x $width = ${depth * width}")
    if (item == null) return 0L // nulls are never counted (reduce skips them)
    import PortableHash.P
    val h = PortableHash.charFold(item)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val a = (i * 2654435761L + 1L) % P
      val b = (i * 40503L + 7L) % P
      val c = sketch(i * width + (((a * h + b) % P) % width).toInt)
      if (c < best) best = c
      i += 1
    }
    best
  }
}
