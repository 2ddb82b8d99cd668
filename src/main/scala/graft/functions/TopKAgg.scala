package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Top-k typed Aggregator over (sortDouble DESC, id1 ASC, id2 ASC) triples.
  *
  * The scale rationale vs a window: a window shuffles EVERY row to its
  * group's partition before ranking; this aggregator keeps a bounded k-row
  * buffer that partial-aggregates map-side, so only k rows per (partition,
  * group) reach the shuffle — the right top-k shape when groups are few
  * and rows are many.
  */
case class TopKRow(priceNeg: Double, id1: Long, id2: Int)

class TopKAggregator(k: Int)
    extends Aggregator[TopKRow, Seq[TopKRow], Seq[TopKRow]] {

  private def best(rows: Seq[TopKRow]): Seq[TopKRow] =
    rows.sortBy(r => (r.priceNeg, r.id1, r.id2)).take(k)

  /** (priceNeg, id1, id2) lexicographic — the same ordering [[best]]
    * sorts by, as a comparison so the hot path never allocates tuples. */
  private def beats(a: TopKRow, worst: TopKRow): Boolean = {
    // java total order, NOT <: NaN / ±0.0 must order exactly as
    // Ordering.Double.TotalOrdering does inside best()'s sortBy, or the
    // short-circuit and the sort would disagree on the buffer's worst
    val c = java.lang.Double.compare(a.priceNeg, worst.priceNeg)
    if (c != 0) c < 0
    else if (a.id1 != worst.id1) a.id1 < worst.id1
    else a.id2 < worst.id2
  }

  override def zero: Seq[TopKRow] = Nil
  // Short-circuit the common case on the ~10⁹-row candidate streams
  // (s15's verified pair stream): once the buffer is full — it stays
  // sorted, best() returns sorted — a row that does not beat the current
  // worst is dropped in one comparison instead of an O(k log k) re-sort
  // plus a Seq allocation per input row.
  override def reduce(b: Seq[TopKRow], a: TopKRow): Seq[TopKRow] =
    if (b.length >= k && !beats(a, b.last)) b else best(b :+ a)
  override def merge(a: Seq[TopKRow], b: Seq[TopKRow]): Seq[TopKRow] = best(a ++ b)
  override def finish(r: Seq[TopKRow]): Seq[TopKRow] = best(r)
  override def bufferEncoder: Encoder[Seq[TopKRow]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKRow]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column form: the product input type flattens to three arguments
    * (priceNeg, id1, id2); result is the top-k array ascending by the
    * negated sort value = descending by value.
    */
  def topK(k: Int, priceNeg: Column, id1: Column, id2: Column): Column =
    udaf(new TopKAggregator(k)).apply(priceNeg, id1, id2)
}
