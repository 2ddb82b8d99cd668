package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KLL-style mergeable quantile sketch — the quantile member of the
  * mergeable-sketch family (Misra-Gries = frequencies, HLL = cardinality,
  * this = ranks). A 100 TB percentile over a non-integer domain can't
  * groupBy values; the sketch streams each partition in O(k·log(n/k))
  * memory and only sketches cross the shuffle, exactly like the other two.
  *
  * Structure (Karnin/Lang/Liberty, FOCS 2016, uniform-capacity variant):
  * a stack of compactors; level l holds items of weight 2^l. When a level
  * reaches [[QuantileSketch.Cap]] items it is sorted and every other item
  * promotes to level l+1 (the survivors carry their pair's weight — the
  * compaction halves the footprint at the cost of ≤ 2^l rank error each).
  * This implementation replaces KLL's coin flip with DETERMINISTIC
  * alternation (a per-level parity flag picks even/odd positions on
  * successive compactions): reproducible across runs and engines — the
  * same trade every oracle-gated operator here makes — at the price of the
  * worst-case randomized bound becoming an empirical one (the spec
  * MEASURES rank error vs exact under several partitionings).
  *
  * merge concatenates level-wise then re-compacts overfull levels — the
  * mergeable-summaries contract (error adds sub-linearly, state stays
  * O(k·levels)) that makes it a map-side partial aggregate.
  */
case class KllState(levels: Seq[Seq[Double]], parity: Seq[Int])

class KllAggregator(cap: Int, qs: Seq[Double])
    extends Aggregator[Double, KllState, Seq[Double]] {

  override def zero: KllState = KllState(Seq(Vector.empty), Seq(0))

  private def compactAll(st: KllState): KllState = {
    var levels = st.levels.map(_.toVector).toVector
    var parity = st.parity.toVector
    var l = 0
    while (l < levels.length) {
      if (levels(l).length >= cap) {
        val sorted = levels(l).sorted
        val keepOdd = parity(l) % 2 == 1
        val promoted = sorted.zipWithIndex
          .collect { case (v, i) if (i % 2 == 1) == keepOdd => v }
        parity = parity.updated(l, parity(l) + 1)
        levels = levels.updated(l, Vector.empty)
        if (l + 1 >= levels.length) {
          levels = levels :+ promoted
          parity = parity :+ 0
        } else {
          levels = levels.updated(l + 1, levels(l + 1) ++ promoted)
        }
      }
      l += 1
    }
    KllState(levels, parity)
  }

  override def reduce(b: KllState, x: Double): KllState =
    compactAll(KllState(b.levels.updated(0, b.levels.head :+ x), b.parity))

  override def merge(a: KllState, b: KllState): KllState = {
    val n = math.max(a.levels.length, b.levels.length)
    def lev(s: KllState, i: Int) =
      if (i < s.levels.length) s.levels(i) else Vector.empty
    def par(s: KllState, i: Int) =
      if (i < s.parity.length) s.parity(i) else 0
    compactAll(KllState(
      (0 until n).map(i => lev(a, i) ++ lev(b, i)),
      (0 until n).map(i => par(a, i) + par(b, i))))
  }

  /** Weighted-rank quantiles: items at level l count 2^l originals. */
  override def finish(st: KllState): Seq[Double] = {
    val weighted = st.levels.zipWithIndex.flatMap { case (items, l) =>
      items.map(v => (v, 1L << l))
    }.sortBy(_._1)
    if (weighted.isEmpty) return qs.map(_ => Double.NaN)
    val total = weighted.map(_._2).sum
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var acc = 0L
      var ans = weighted.last._1
      val it = weighted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        acc += w
        if (acc >= target) { ans = v; found = true }
      }
      ans
    }
  }

  override def bufferEncoder: Encoder[KllState] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

/** Null-skipping wrapper over [[KllAggregator]] — the manifest
  * histogram pass aggregates arbitrary (possibly null) columns; a null
  * or NaN contributes nothing to the rank structure (the paired null
  * COUNT is recorded separately).
  */
class KllNullSafeAggregator(cap: Int, qs: Seq[Double])
    extends Aggregator[java.lang.Double, KllState, Seq[Double]] {
  private val inner = new KllAggregator(cap, qs)
  override def zero: KllState = inner.zero
  override def reduce(b: KllState, x: java.lang.Double): KllState =
    if (x == null || x.isNaN) b else inner.reduce(b, x.doubleValue())
  override def merge(a: KllState, b: KllState): KllState = inner.merge(a, b)
  override def finish(st: KllState): Seq[Double] = inner.finish(st)
  override def bufferEncoder: Encoder[KllState] = inner.bufferEncoder
  override def outputEncoder: Encoder[Seq[Double]] = inner.outputEncoder
}

object QuantileSketch {
  val Cap = 200

  /** Bin count of the manifest histogram synopsis: per-file boundary
    * lists are HistBins+1 doubles; the scan-build merge re-extracts
    * HistBins global equi-height bins. 32 bins ≈ 3% rank granularity —
    * the histogram CBO precision class — at 264 B per column per file.
    */
  val HistBins = 32

  /** Column form: aggregate a double column into quantile estimates at
    * fractions `qs`. */
  def kllQuantiles(col: Column, qs: Seq[Double], cap: Int = Cap): Column =
    udaf(new KllAggregator(cap, qs)).apply(col)

  /** Equi-height boundary extraction (nulls/NaNs skipped): the
    * [[HistBins]]+1 quantile fractions 0, 1/B, …, 1 of a column — the
    * per-file histogram synopsis the manifest records.
    */
  def kllBoundaries(col: Column, bins: Int = HistBins,
      cap: Int = Cap): Column =
    udaf(new KllNullSafeAggregator(cap,
      (0 to bins).map(_.toDouble / bins))).apply(col)

  /** MERGE per-file equi-height synopses into ONE global equi-height
    * boundary list — the scan-build fold matching KMV's k-smallest
    * union. Model: each file contributes `rows/B` mass uniform on each
    * of its B bins, so the global CDF is a sum of piecewise-linear
    * CDFs; the merged boundaries invert it exactly (one sweep over the
    * sorted segment endpoints, point masses for zero-width bins).
    * Error adds sub-linearly like any mergeable summary: each file's
    * boundaries are within its own sketch error, and the piecewise-
    * uniform model is exact at the recorded boundaries.
    */
  def mergeEquiHeight(perFile: Seq[(Seq[Double], Long)],
      bins: Int = HistBins): Seq[Double] = {
    // segments: (lo, hi, mass); zero-width = point mass
    val segs = perFile.flatMap { case (bs, rows) =>
      if (bs.length < 2 || rows <= 0) Nil
      else {
        val m = rows.toDouble / (bs.length - 1)
        bs.sliding(2).map { case Seq(lo, hi) => (lo, hi, m) }.toSeq
      }
    }
    if (segs.isEmpty) return Nil
    val total = segs.map(_._3).sum
    // one sweep over sorted endpoints — O(F·B log(F·B)), never O(F²·B²):
    // linear segments contribute slope on [lo, hi]; zero-width bins are
    // point masses (CDF jumps AT their x)
    val pointMass = scala.collection.mutable.HashMap.empty[Double, Double]
    val slopeAt = scala.collection.mutable.HashMap.empty[Double, Double]
    segs.foreach { case (lo, hi, m) =>
      if (lo == hi) pointMass(lo) = pointMass.getOrElse(lo, 0.0) + m
      else {
        val sl = m / (hi - lo)
        slopeAt(lo) = slopeAt.getOrElse(lo, 0.0) + sl
        slopeAt(hi) = slopeAt.getOrElse(hi, 0.0) - sl
      }
    }
    val xs = (pointMass.keySet ++ slopeAt.keySet).toArray.sorted
    val cum = new Array[Double](xs.length)
    var slope = 0.0
    var acc = 0.0
    var prev = xs(0)
    var i = 0
    while (i < xs.length) {
      acc += slope * (xs(i) - prev)
      acc += pointMass.getOrElse(xs(i), 0.0)
      cum(i) = acc
      slope += slopeAt.getOrElse(xs(i), 0.0)
      prev = xs(i)
      i += 1
    }
    // invert: boundary j at mass j·total/B — linear within a gap up to
    // the right endpoint's jump, the jump itself lands on the endpoint
    (0 to bins).map { j =>
      val target = total * j / bins
      if (target <= cum(0)) xs(0)
      else if (target >= cum(xs.length - 1)) xs(xs.length - 1)
      else {
        var k = 1
        while (cum(k) < target) k += 1
        val (x0, x1, c0, c1) = (xs(k - 1), xs(k), cum(k - 1), cum(k))
        val linTop = c1 - pointMass.getOrElse(x1, 0.0)
        if (target > linTop || linTop == c0) x1
        else x0 + (x1 - x0) * (target - c0) / (linTop - c0)
      }
    }
  }
}
