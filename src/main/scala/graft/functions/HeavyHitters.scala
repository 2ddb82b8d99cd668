package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy hitters — the bounded-memory frequent-items sketch
  * for vocabulary-scale streams (hot keys, top tokens, trending entities)
  * where an exact groupBy would shuffle |distinct| rows.
  *
  * The sketch keeps at most k−1 counters. Guarantees (deterministic, not
  * probabilistic): every item with true frequency > n/k is present in the
  * sketch, and each retained estimate undercounts its true frequency by at
  * most n/k. Both survive the distributed merge (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): summing two sketches and re-pruning
  * to k−1 counters preserves the combined error bound, which is exactly
  * what makes this usable as a map-side partial aggregate — each partition
  * streams through once with O(k) state, and only k−1 counters per
  * partition reach the shuffle.
  *
  * HeavyHittersSpec asserts both guarantees against exact counts.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k - 1 => b.updated(item, 1L)
      case None =>
        // decrement-all step: every counter gives up one unit (the classic
        // "cancel k distinct items against each other" move)
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (item, c)) =>
      m.updated(item, m.getOrElse(item, 0L) + c)
    }
    if (summed.size <= k - 1) summed
    else {
      // prune back to k−1 counters by subtracting the k-th largest count
      // from everything (the mergeable-summaries merge)
      val kth = summed.values.toSeq.sortBy(-_).apply(k - 1)
      summed.view.mapValues(_ - kth).filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object HeavyHitters {
  /** Column form: aggregate a string column into the ≤(k−1)-entry
    * item→estimate map.
    */
  def misraGries(k: Int, item: Column): Column =
    udaf(new MisraGriesAggregator(k)).apply(item)
}
