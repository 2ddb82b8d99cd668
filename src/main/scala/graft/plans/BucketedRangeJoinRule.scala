package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, LongType, NumericType, TimestampType}

/** Optimizer rule: rewrite a big-big interval (range) theta-join into the
  * bucketed equi-join q47 composes by hand — the user writes the natural
  * form, `probe JOIN intervals ON v >= lo AND v <= hi`, and the optimizer
  * removes the nested loop.
  *
  * Rewrite (width W from `spark.graft.rangeJoin.width`, 0 = off):
  * the probe side gains bucket(v) = floor(v / W); the interval side
  * explodes to one row per covered bucket (sequence(bucket(lo),
  * bucket(hi))); the join becomes bucket-equality AND the ORIGINAL range
  * predicate. This is exactly semantics-preserving, not approximate:
  * bucket() is monotone, so lo ≤ v ≤ hi ⇒ bucket(lo) ≤ bucket(v) ≤
  * bucket(hi) — every true pair meets; the probe row has exactly ONE
  * bucket and the interval emits each covered bucket once — no pair can
  * meet twice, so no dedup is needed (the invariant PropertySpec
  * fuzz-proves for q47). A null v or null bound produces a null bucket /
  * empty sequence and drops out, matching the theta-join's null semantics.
  *
  * The rule fires only when the join has NO equi conjunct (with one, Spark
  * already hash-partitions and the range is a cheap post-filter — and the
  * bucket equality the rewrite introduces is itself the fixpoint guard).
  * Cost: shuffle O(|probe| + |intervals| · spans) instead of O(|probe| ×
  * |intervals|) compute; W tunes spans-per-interval against rows-per-bucket
  * exactly as in q47.
  *
  * Activation: `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `spark.experimental.extraOptimizations`) + setting the width conf.
  */
case class BucketedRangeJoinRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.width"

  private def width: Long =
    try session.conf.get(WidthConf, "0").toLong catch { case _: Exception => 0L }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && cond.deterministic =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  /** v >= lo / v <= hi (or mirrored) with v strictly from one side and the
    * bound strictly from the other; returns (v, bound, boundIsLower).
    */
  private def rangeBound(e: Expression, pSet: AttributeSet, iSet: AttributeSet)
      : Option[(Expression, Expression, Boolean)] = {
    def compatible(v: DataType, b: DataType): Boolean = (v, b) match {
      case (_: NumericType, _: NumericType) => true
      case (TimestampType, TimestampType) => true
      case (DateType, DateType) => true
      case _ => false
    }
    def sided(v: Expression, b: Expression): Boolean =
      v.references.nonEmpty && v.references.subsetOf(pSet) &&
        b.references.nonEmpty && b.references.subsetOf(iSet) &&
        compatible(v.dataType, b.dataType)
    e match {
      case GreaterThanOrEqual(v, b) if sided(v, b) => Some((v, b, true))
      case GreaterThan(v, b) if sided(v, b) => Some((v, b, true))
      case LessThanOrEqual(b, v) if sided(v, b) => Some((v, b, true))
      case LessThan(b, v) if sided(v, b) => Some((v, b, true))
      case LessThanOrEqual(v, b) if sided(v, b) => Some((v, b, false))
      case LessThan(v, b) if sided(v, b) => Some((v, b, false))
      case GreaterThanOrEqual(b, v) if sided(v, b) => Some((v, b, false))
      case GreaterThan(b, v) if sided(v, b) => Some((v, b, false))
      case _ => None
    }
  }

  /** floor(e / W) as LONG. Only MONOTONICITY matters for exactness — the
    * original predicate re-verifies every candidate — and every step here
    * is monotone: long→double cast is order-preserving even above 2^53
    * (rounding to nearest never swaps order), divide by a positive
    * constant, floor. Negative values floor toward −∞, which keeps
    * bucket(lo) ≤ bucket(v) ≤ bucket(hi) for lo ≤ v ≤ hi.
    * Event-time types go through their epoch expressions (ANSI forbids a
    * direct timestamp→numeric cast), so W is in the column's native unit:
    * value units for numerics, MICROSECONDS for timestamps, DAYS for dates.
    */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val numeric = e.dataType match {
      case TimestampType => UnixMicros(e)
      case DateType => UnixDate(e)
      case _ => e
    }
    Floor(Divide(Cast(numeric, DoubleType), Literal(w.toDouble)))
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // with an equi conjunct the join is already a hash/merge join — and the
    // rewritten join's bucket equality trips this guard, giving the fixpoint
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    // find a (v, lo, hi) triple: same probe expression bounded below AND
    // above by the other side — try probe=left first, then probe=right
    def findTriple(pSet: AttributeSet, iSet: AttributeSet)
        : Option[(Expression, Expression, Expression)] = {
      val bounds = conjuncts.flatMap(c => rangeBound(c, pSet, iSet))
      val byProbe = bounds.groupBy(_._1.canonicalized)
      byProbe.values.collectFirst {
        case bs if bs.exists(_._3) && bs.exists(!_._3) =>
          val v = bs.head._1
          val lo = bs.find(_._3).get._2
          val hi = bs.find(!_._3).get._2
          (v, lo, hi)
      }
    }

    val probeLeft = findTriple(left.outputSet, right.outputSet).map((_, true))
    val triple = probeLeft.orElse(
      findTriple(right.outputSet, left.outputSet).map((_, false)))

    triple.map { case ((v, lo, hi), vFromLeft) =>
      val probeBucket = Alias(bucketOf(v, w), "__graft_probe_bucket")()
      // Sequence is TimeZoneAwareExpression: resolved requires timeZoneId,
      // which the analyzer would fill — an optimizer rule must set it itself
      val seqExpr = Sequence(bucketOf(lo, w), bucketOf(hi, w),
        Some(Literal(1L)), Some(session.sessionState.conf.sessionLocalTimeZone))
      val bucketAttr = AttributeReference("__graft_bucket", LongType)()
      def bucketize(probe: LogicalPlan, intervals: LogicalPlan)
          : (LogicalPlan, LogicalPlan) =
        (Project(probe.output :+ probeBucket, probe),
          Generate(Explode(seqExpr), Nil, outer = false, None,
            Seq(bucketAttr), intervals))
      val (newLeft, newRight) =
        if (vFromLeft) {
          val (p, i) = bucketize(left, right); (p, i)
        } else {
          val (p, i) = bucketize(right, left); (i, p)
        }
      val newCond = And(EqualTo(probeBucket.toAttribute, bucketAttr), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
