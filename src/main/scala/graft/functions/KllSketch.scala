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

object QuantileSketch {
  val Cap = 200

  /** Column form: aggregate a double column into quantile estimates at
    * fractions `qs`. */
  def kllQuantiles(col: Column, qs: Seq[Double], cap: Int = Cap): Column =
    udaf(new KllAggregator(cap, qs)).apply(col)
}
