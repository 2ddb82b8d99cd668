package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A10: KMV / bottom-k THETA sketch — the SET-OPERATION cardinality
  * sketch that completes the distinct-count story A6 (HLL) opens: HLL
  * answers |A| and |A ∪ B| (register-max merge) but fundamentally cannot
  * intersect; a theta sketch is a uniform SAMPLE of the hash space (the k
  * minimum distinct hash values), so |A ∩ B|, overlap ratios and Jaccard
  * between SEGMENTS (sources, dates, dedup partitions) fall out of plain
  * set algebra on the retained samples — "how many users/docs do these
  * two sources share" is a one-sketch-per-segment question at any scale.
  *
  * Determinism: the hash is the portable char-fold scrambled by the
  * Knuth multiplier (a bijection on [0, 2³²), so distinctness is
  * preserved); the sketch of a multiset is its k smallest distinct hash
  * values — a pure function of the SET, so two sketches of the same data
  * are BIT-IDENTICAL under any partitioning/arrival order (KmvSpec
  * asserts equality under 1/7/32 partitions), and below k the sketch IS
  * the exact distinct set (estimates exact by construction).
  *
  * Estimators (all closed-form, no RNG):
  *  - distinct:   D̂ = (k−1)/u_(k)  (u_(k) = kth-min normalized hash);
  *    exact when fewer than k distinct values were seen. RSE ≈ 1/√(k−2).
  *  - intersection/union of two sketches: θ = min(θ_A, θ_B); every
  *    retained value < θ is a uniform θ-rate sample of the underlying
  *    set, so |A ∩ B| ≈ |{v < θ retained in both}|/θ, and Jaccard is the
  *    matched/combined ratio below θ.
  *
  * 100 TB: the buffer is ≤ k longs (k = 256 → 2 KiB) regardless of input;
  * partials fold map-side and merge as sorted-array unions — the same
  * shuffle shape as any partial aggregate, one buffer per partition.
  */
class KmvAggregator(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  private def hash(item: String): Long =
    PortableHash.scramble32(PortableHash.charFold(item))

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], item: String): Array[Long] = {
    if (item == null) return b
    val h = hash(item)
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) return b // already retained
    if (b.length >= k && h > b(b.length - 1)) return b // above the kth min
    val at = -pos - 1
    val out = new Array[Long](math.min(b.length + 1, k))
    System.arraycopy(b, 0, out, 0, at)
    out(at) = h
    System.arraycopy(b, at, out, at + 1, out.length - at - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-union, distinct, first k — associative/commutative by
    // construction (the k smallest of a set is partition-order blind)
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (v != last) { out(n) = v; n = n + 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object KmvSketch {
  /** Default k: 2 KiB buffer, RSE ≈ 1/√254 ≈ 6.3%. */
  val K = 256

  /** Manifest-resident k (per-file `ndvKey` synopses in [[graft.ops
    * .Layout]] entries): 64 longs ≈ 512 B per column per file, RSE
    * ≈ 1/√62 ≈ 12.7% — optimizer-grade (a broadcast/reorder decision
    * needs the order of magnitude, not the third digit).
    */
  val ManifestK = 64

  /** Merge two bottom-k synopses (k-smallest distinct union) — the
    * read-side fold that turns per-file manifest sketches into a
    * table-/partition-level NDV estimate.
    */
  def merge(a: Seq[Long], b: Seq[Long], k: Int = ManifestK): Seq[Long] = {
    val agg = new KmvAggregator(k)
    agg.merge(a.toArray, b.toArray).toSeq
  }

  private val M = PortableHash.M32.toDouble // scrambled values live in [0, 2³²)

  def kmv(item: Column, k: Int = K): Column = udaf(new KmvAggregator(k)).apply(item)

  /** Distinct-count estimate; exact below k by construction. */
  def estimateDistinct(sketch: Array[Long], k: Int = K): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / (sketch(k - 1).toDouble / M)

  /** θ for a sketch: the sampling rate its retained values represent. */
  private def theta(sk: Array[Long], k: Int): Double =
    if (sk.length < k) 1.0 else sk(k - 1).toDouble / M

  /** |A ∩ B| estimate from two sketches built with the same k; exact when
    * both sketches are still exact (θ = 1).
    */
  def estimateIntersection(a: Array[Long], b: Array[Long], k: Int = K): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val bs = b.toSet
    if (th >= 1.0) a.count(bs.contains).toDouble
    else {
      val lim = (th * M).toLong
      a.count(v => v < lim && bs.contains(v)) / th
    }
  }

  /** Jaccard estimate below the common θ. */
  def estimateJaccard(a: Array[Long], b: Array[Long], k: Int = K): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val lim = if (th >= 1.0) Long.MaxValue else (th * M).toLong
    val sa = a.filter(_ < lim).toSet
    val sb = b.filter(_ < lim).toSet
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else (sa & sb).size.toDouble / union
  }
}
