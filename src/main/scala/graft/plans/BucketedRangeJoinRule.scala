package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.Literal.{FalseLiteral, TrueLiteral}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DateType, DoubleType, LongType, NumericType, StringType, StructType, TimestampNTZType, TimestampType}

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
  * elements). The span test is computed in DOUBLES (a Long subtraction of
  * two extreme bucket ids can overflow and wrap negative, silently
  * defeating the guard); above 2^53 the double is approximate but any
  * such span exceeds the cap by orders of magnitude anyway. What happens
  * to a too-wide interval depends on the join shape:
  *
  *  - EQUI+RANGE with `spark.graft.rangeJoin.wideFallback` (default ON):
  *    the wide interval routes through a SENTINEL bucket instead of
  *    exploding. Both sides emit (bucket, isWide) pairs — the probe
  *    duplicates each row as (bucket(v), false) and (0, true); a narrow
  *    interval emits (b, false) per covered bucket; a wide one emits the
  *    single (0, true) row. Narrow pairs meet exactly once on the real
  *    bucket; wide pairs meet exactly once on the sentinel — i.e. wide
  *    intervals degrade per-row to exactly the per-equi-key hash join +
  *    range post-filter the PRE-rewrite plan ran, while narrow intervals
  *    keep the bucket pruning. Exact, never errors; the price is a 2×
  *    probe-side generate (disable the fallback to reclaim it and get the
  *    loud error instead).
  *  - PURE RANGE (no equi conjunct): a sentinel stream would be the full
  *    cartesian product, i.e. the nested loop this rule exists to remove —
  *    so the generator raises a NAMED error telling the operator to raise
  *    W, raise the cap, or unset the width conf (under which the query
  *    still runs, as a nested loop). Loud failure, not a semantics change:
  *    no row the theta-join would match is ever silently dropped.
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
  val WideFallbackConf = "spark.graft.rangeJoin.wideFallback"

  private def width: Long =
    try session.conf.get(WidthConf, "0").toLong catch { case _: Exception => 0L }
  private def maxSpan: Long =
    try session.conf.get(MaxSpanConf, (1L << 22).toString).toLong
    catch { case _: Exception => 1L << 22 }
  private def wideFallback: Boolean =
    try session.conf.get(WideFallbackConf, "true").toBoolean
    catch { case _: Exception => true }

  /** Synthetic names; their presence in a join condition marks an
    * already-rewritten join (the fixpoint guard).
    */
  val ProbeBucketName = "__graft_probe_bucket"
  val IntervalBucketName = "__graft_bucket"
  val ProbeWideName = "__graft_probe_wide"
  val IntervalWideName = "__graft_wide"

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
      case (TimestampNTZType, TimestampNTZType) => true
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
      // NTZ (parquet micros with isAdjustedToUTC=false): localize at a
      // PINNED UTC zone, never the session zone — wall-clock→instant in a
      // DST-observing zone is non-monotone (fall-back repeats an hour), and
      // a non-monotone bucket() could miss true pairs. UTC is a fixed zero
      // offset, so the mapping is monotone for any session configuration;
      // both sides bucket through the same expression, so the (internal)
      // bucket ids stay consistent.
      case TimestampNTZType =>
        UnixMicros(Cast(e, TimestampType, Some("UTC")))
      case DateType => UnixDate(e)
      case _ => e
    }
    Floor(Divide(Cast(numeric, DoubleType), Literal(w.toDouble)))
  }

  /** span > cap, computed in doubles: Subtract(bHi, bLo) on LongType can
    * overflow for extreme bucket ids (huge probe values / tiny W) and wrap
    * NEGATIVE — tooWide would read false and the plan would fall through to
    * sequence()'s opaque boundary error, exactly the failure this guard
    * replaces. Doubles cannot overflow here (|bucket| ≤ 2^63 ≪ 1e308), and
    * any span whose double is approximate (> 2^53) exceeds the cap by
    * orders of magnitude, so the comparison is still decided correctly.
    */
  private def spanTooWide(bLo: Expression, bHi: Expression, cap: Long): Expression =
    GreaterThan(Subtract(Cast(bHi, DoubleType), Cast(bLo, DoubleType)),
      Literal(cap.toDouble))

  /** The interval-side generator: one bucket id per covered bucket.
    *
    * - inverted (bLo > bHi) or null-bounded intervals → null array →
    *   Explode(outer=false) emits nothing, exactly like the theta-join;
    * - spans wider than maxSpan → named error (see class doc) instead of
    *   sequence()'s opaque boundary/array-size crash.
    */
  private def bucketSeq(bLo: Expression, bHi: Expression,
      hasEqui: Boolean): Expression = {
    val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
    // Sequence is TimeZoneAwareExpression: resolved requires timeZoneId,
    // which the analyzer would fill — an optimizer rule must set it itself
    val seq = Sequence(bLo, bHi, Some(Literal(1L)), tz)
    val nullArr = Literal.create(null, ArrayType(LongType))
    val guarded = If(LessThanOrEqual(bLo, bHi), seq, nullArr)
    val cap = maxSpan
    if (cap <= 0) guarded
    else {
      val tooWide = spanTooWide(bLo, bHi, cap)
      val hint =
        if (hasEqui) s"set $WideFallbackConf=true to route wide intervals " +
          "through the equi-key hash path, or "
        else ""
      val err = new RaiseError(
        Literal("USER_RAISED_EXCEPTION"),
        CreateMap(Seq(Literal("errorMessage"), Literal(
          s"graft range join: an interval spans more than $cap buckets; " +
            s"raise $WidthConf, raise $MaxSpanConf, ${hint}or set " +
            s"$WidthConf=0 to run without the rule (the pre-rewrite plan)"))),
        ArrayType(LongType))
      If(And(IsNotNull(tooWide), tooWide), err, guarded)
    }
  }

  // ----- sentinel-pair machinery (equi+range wide-interval fallback) -----

  private val PairType = new StructType()
    .add("b", LongType, nullable = true).add("w", BooleanType, nullable = false)

  private def pairOf(bucket: Expression, wide: Expression): Expression =
    CreateNamedStruct(Seq(Literal("b"), bucket, Literal("w"), wide))

  /** Interval-side generator under the fallback: a narrow interval emits
    * (b, false) per covered bucket; a too-wide one emits the single
    * sentinel (0, true); inverted/null-bounded emit nothing.
    */
  private def bucketPairSeq(bLo: Expression, bHi: Expression): Expression = {
    val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
    val seq = Sequence(bLo, bHi, Some(Literal(1L)), tz)
    val lv = NamedLambdaVariable("b", LongType, nullable = false)
    val narrow = ArrayTransform(seq, LambdaFunction(pairOf(lv, FalseLiteral), Seq(lv)))
    val nullArr = Literal.create(null, ArrayType(PairType))
    val guarded = If(LessThanOrEqual(bLo, bHi), narrow, nullArr)
    val cap = maxSpan
    if (cap <= 0) guarded
    else {
      val sentinel = CreateArray(Seq(pairOf(Literal(0L), TrueLiteral)))
      val tooWide = spanTooWide(bLo, bHi, cap)
      If(And(IsNotNull(tooWide), tooWide), sentinel, guarded)
    }
  }

  /** Probe-side generator under the fallback: every probe row duplicates
    * into its real pair (bucket(v), false) — meeting narrow intervals —
    * and the sentinel (0, true) — meeting wide ones. A null bucket(v)
    * matches no narrow bucket and the original predicate drops the
    * sentinel copy, preserving null semantics.
    */
  private def probePairs(v: Expression, w: Long): Expression =
    CreateArray(Seq(pairOf(bucketOf(v, w), FalseLiteral),
      pairOf(Literal(0L), TrueLiteral)))

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

    // an equi conjunct (either side order) means the pre-rewrite plan was
    // already a hash join — the wide-interval fallback is available and a
    // maxSpan error would be a regression the fallback avoids
    def sidedEq(a: Expression, b: Expression): Boolean =
      (a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
        b.references.nonEmpty && b.references.subsetOf(right.outputSet)) ||
        (a.references.nonEmpty && a.references.subsetOf(right.outputSet) &&
          b.references.nonEmpty && b.references.subsetOf(left.outputSet))
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => sidedEq(a, b)
      case EqualNullSafe(a, b) => sidedEq(a, b)
      case _ => false
    }

    triple.map { case ((v, lo, hi), vFromLeft) =>
      if (hasEqui && wideFallback && maxSpan > 0) {
        // sentinel-pair form: both sides generate (bucket, isWide) rows
        val pb = AttributeReference(ProbeBucketName, LongType)()
        val pw = AttributeReference(ProbeWideName, BooleanType, nullable = false)()
        val ib = AttributeReference(IntervalBucketName, LongType)()
        val iw = AttributeReference(IntervalWideName, BooleanType, nullable = false)()
        def bucketize(probe: LogicalPlan, intervals: LogicalPlan)
            : (LogicalPlan, LogicalPlan) =
          (Generate(Inline(probePairs(v, w)), Nil, outer = false, None,
            Seq(pb, pw), probe),
            Generate(Inline(bucketPairSeq(bucketOf(lo, w), bucketOf(hi, w))),
              Nil, outer = false, None, Seq(ib, iw), intervals))
        val (newLeft, newRight) =
          if (vFromLeft) {
            val (p, i) = bucketize(left, right); (p, i)
          } else {
            val (p, i) = bucketize(right, left); (i, p)
          }
        val newCond = And(And(EqualTo(pb, ib), EqualTo(pw, iw)), cond)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
      } else {
        val probeBucket = Alias(bucketOf(v, w), ProbeBucketName)()
        val seqExpr = bucketSeq(bucketOf(lo, w), bucketOf(hi, w), hasEqui)
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
}
