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
