package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, DoubleType, LongType, NumericType, StringType, TimestampType}

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
  * a null (dropped) sequence, matching the theta-join's null semantics.
  * An INVERTED interval (lo > hi — matches nothing under the theta-join)
  * likewise emits a null sequence and drops out: the generator is wrapped
  * in `IF(bucket(lo) <= bucket(hi), sequence(...), NULL)` because Spark's
  * sequence() throws on start > stop rather than returning empty.
  *
  * Equi+range ("join on key AND ts within window"): when the condition
  * ALSO carries equi conjuncts, the same rewrite applies — the bucket
  * equality is appended and Spark's ExtractEquiJoinKeys picks up
  * (key, bucket) as the composite join key, so rows co-partition by
  * key AND time-bucket instead of post-filtering the full per-key cross
  * product (the skewed-key production shape). The fixpoint guard is the
  * presence of the synthetic bucket attribute in the condition, NOT
  * "any equi conjunct exists" — the rewritten join carries the bucket
  * equality, so the rule never fires twice on the same join.
  *
  * Wide-interval guard (`spark.graft.rangeJoin.maxSpan`, buckets; 0 = off,
  * default 4,194,304): an interval spanning more than maxSpan buckets
  * means W is mis-sized for the data — the explode would emit millions of
  * rows per interval (and Spark's sequence() hard-errors near 2^31
  * elements). Rather than crash with an opaque array-size error mid-stage,
  * the generator raises a named error telling the operator to raise W or
  * disable the rule. This is a loud-failure guard, not a semantics change:
  * no row that the theta-join would match is ever silently dropped.
  *
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
  val MaxSpanConf = "spark.graft.rangeJoin.maxSpan"

  private def width: Long =
    try session.conf.get(WidthConf, "0").toLong catch { case _: Exception => 0L }
  private def maxSpan: Long =
    try session.conf.get(MaxSpanConf, (1L << 22).toString).toLong
    catch { case _: Exception => 1L << 22 }

  /** Synthetic names; their presence in a join condition marks an
    * already-rewritten join (the fixpoint guard).
    */
  val ProbeBucketName = "__graft_probe_bucket"
  val IntervalBucketName = "__graft_bucket"

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

  /** The interval-side generator: one bucket id per covered bucket.
    *
    * - inverted (bLo > bHi) or null-bounded intervals → null array →
    *   Explode(outer=false) emits nothing, exactly like the theta-join;
    * - spans wider than maxSpan → named error (see class doc) instead of
    *   sequence()'s opaque boundary/array-size crash.
    */
  private def bucketSeq(bLo: Expression, bHi: Expression): Expression = {
    val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
    // Sequence is TimeZoneAwareExpression: resolved requires timeZoneId,
    // which the analyzer would fill — an optimizer rule must set it itself
    val seq = Sequence(bLo, bHi, Some(Literal(1L)), tz)
    val nullArr = Literal.create(null, ArrayType(LongType))
    val guarded = If(LessThanOrEqual(bLo, bHi), seq, nullArr)
    val cap = maxSpan
    if (cap <= 0) guarded
    else {
      val tooWide = GreaterThan(Subtract(bHi, bLo), Literal(cap))
      val err = new RaiseError(
        Literal("USER_RAISED_EXCEPTION"),
        CreateMap(Seq(Literal("errorMessage"), Literal(
          s"graft range join: an interval spans more than $cap buckets; " +
            s"raise $WidthConf, raise $MaxSpanConf, or set $WidthConf=0 " +
            "to fall back to the nested-loop plan"))),
        ArrayType(LongType))
      If(And(IsNotNull(tooWide), tooWide), err, guarded)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    // fixpoint guard: the rewritten join's condition carries the synthetic
    // bucket attributes — never fire twice on the same join
    if (cond.references.exists(a =>
        a.name == ProbeBucketName || a.name == IntervalBucketName)) return None
    val conjuncts = splitConjunctivePredicates(cond)

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
      val probeBucket = Alias(bucketOf(v, w), ProbeBucketName)()
      val seqExpr = bucketSeq(bucketOf(lo, w), bucketOf(hi, w))
      val bucketAttr = AttributeReference(IntervalBucketName, LongType)()
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
