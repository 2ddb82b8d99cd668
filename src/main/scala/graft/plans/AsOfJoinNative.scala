package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join via the full custom-operator mechanism:
  * LogicalPlan node → SparkStrategy → physical SparkPlan — the (c) rung of
  * the extension ladder (SURVEY §4), used where the composed union+window
  * form (graft.ops.AsOfJoin) pays an avoidable cost: the union sorts
  * |L|+|R| rows in ONE window partition per key, while this operator
  * merge-joins two independently sorted children with an O(1)-state pointer
  * sweep — no union relation, no null-padded columns, and Spark inserts the
  * hash exchanges/sorts itself because the node declares its required child
  * distribution and ordering (same contract SortMergeJoinExec uses).
  *
  * Semantics (inner): for each left row, the right row with the greatest
  * rightTime ≤ leftTime within the same key (right deduplicated per
  * (key, time) by the caller for determinism, as with the composed form).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(lk, rk, lt, rt, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload

  // EnsureRequirements reads these and inserts the hash exchanges + sorts:
  // both sides clustered by key, sorted by (key, time) within partitions.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // bind attribute references to child output ordinals for row evaluation
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val payloadAttrs = payload
    val rightOutput = right.output
    val outputAttrs = output
    val leftOutput = left.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOutput)
      // downstream operators (Sort, shuffle writers) cast to UnsafeRow —
      // flatten the JoinedRow through an unsafe projection
      val resultProj = UnsafeProjection.create(outputAttrs, leftOutput ++ payloadAttrs)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      lIter.flatMap { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        var advance = true
        while (advance && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKey.eval(r)
          val c = keyOrd.asInstanceOf[Ordering[Any]].compare(rk, k)
          if (c < 0) rBuf.next() // right row behind the current key
          else if (c == 0 &&
              timeOrd.asInstanceOf[Ordering[Any]].compare(rTime.eval(r), t) <= 0) {
            lastMatch = rBuf.next().copy() // newest match so far for this key
            // re-evaluate the key from the COPIED row: a value evaluated from
            // the buffered row (e.g. a UTF8String) may point into the
            // upstream sort iterator's reused UnsafeRow buffer and be
            // silently overwritten by the next right row
            lastMatchKey = rKey.eval(lastMatch)
          } else advance = false
        }
        if (lastMatch != null &&
            keyOrd.asInstanceOf[Ordering[Any]].compare(lastMatchKey, k) == 0)
          Iterator.single[InternalRow](resultProj(joined(lRow, payloadProj(lastMatch))))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

object AsOfJoinNative {

  /** Native as-of join entry point. Registers the planner strategy on the
    * session (idempotent; `spark.experimental.extraStrategies` is the
    * public runtime hook — GraftExtensions-based injection works the same
    * for conf-built sessions).
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found in ${plan.output.map(_.name)}"))
    GraftDatasetBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      payload.map(attr(rPlan, _))))
  }
}
