package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ↔ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils), needed to expose graft's
  * native Catalyst expressions as user-facing Columns on Spark 4.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge for planting MEASURED statistics on a checkpointed Dataset.
  *
  * `Dataset.checkpoint`/`localCheckpoint` wrap the materialized RDD in
  * a [[org.apache.spark.sql.execution.LogicalRDD]] that snapshots the
  * ORIGIN plan's statistics — an estimate that can be wrong by orders
  * of magnitude for array-heavy rows (Catalyst prices an
  * `array<bigint>` column at a fixed default width, so a 128-perm
  * minhash frame "shrinks" under the broadcast threshold while its
  * real build size is 50×). Since the checkpoint HAS materialized
  * every row, the real size is measurable — this bridge rebuilds the
  * LogicalRDD with the measured Statistics so join planning sees the
  * truth ([[graft.ops.Pin]] is the caller).
  */
object GraftStatsBridge {
  def withStats[T](ds: Dataset[T], sizeInBytes: Long,
      rowCount: Option[Long]): Dataset[T] = {
    val cds = ds.asInstanceOf[classic.Dataset[T]]
    cds.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val st = catalyst.plans.logical.Statistics(
          sizeInBytes = BigInt(math.max(1L, sizeInBytes)),
          rowCount = rowCount.map(n => BigInt(math.max(0L, n))))
        val lr2 = execution.LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(cds.sparkSession, Some(st), None)
        new classic.Dataset[T](cds.sparkSession, lr2, cds.encoder)
      case _ => ds
    }
  }

  /** The checkpointed Dataset's underlying RDD (the blocks the block
    * manager reports storage for), when the plan is a LogicalRDD.
    */
  def underlyingRddId[T](ds: Dataset[T]): Option[Int] =
    ds.asInstanceOf[classic.Dataset[T]].queryExecution.analyzed match {
      case lr: execution.LogicalRDD => Some(lr.rdd.id)
      case _ => None
    }
}

/** Bridge for constructing a DataFrame from a hand-built LogicalPlan
  * (classic.Dataset.ofRows is private[sql]).
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A DataFrame carrying `isStreaming = true` — what a V1 streaming
    * `Source.getBatch` must return (the engine asserts it). The batch
    * plan is materialized lazily through its InternalRow RDD, the same
    * shape Delta's source uses for arbitrary delta plans.
    */
  def streamingDataFrame(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** The inverse rebind for a V1 `Sink.addBatch` frame: wrap the
    * micro-batch's executed plan as an ordinary batch DataFrame
    * (ForeachBatchSink's shape) so downstream `.write` works on it.
    */
  def batchDataFrame(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
}
