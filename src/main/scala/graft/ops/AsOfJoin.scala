package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join (most-recent-≤ match) composed from Spark built-ins.
  *
  * Spark has no native as-of join. A naive implementation joins on the key
  * and filters `rightTime <= leftTime` then takes argmax — a near-cross
  * product per key that explodes on hot keys. The scalable composition is
  * the union trick:
  *
  *  1. tag left rows (probe) and right rows (reference),
  *  2. union them into one relation keyed by (key, time, isRight),
  *  3. one window sorted by (time, isRight DESC, ...) per key carries the
  *     last-seen right-side payload forward (`last(_, ignoreNulls=true)`),
  *  4. keep only left rows with a carried match.
  *
  * Cost: ONE shuffle of |L|+|R| rows and one sort per partition — linear,
  * skew-tolerant (a hot key is still a single sorted run), and it
  * broadcast-joins nothing, so it survives 100 TB on both sides.
  * Right rows sort before left rows at equal timestamps, giving the
  * inclusive (`rightTime <= leftTime`) semantics DuckDB's ASOF JOIN has.
  */
object AsOfJoin {

  /** Generic as-of join.
    * @param left       probe side
    * @param right      reference side (must be deduplicated per
    *                   (key, time) by the caller if determinism matters)
    * @param leftKey    join key column on left
    * @param rightKey   join key column on right
    * @param leftTime   event-time column on left
    * @param rightTime  event-time column on right
    * @param payload    right-side columns to carry onto matching left rows
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__key", "__t", "__isRight", "__p", "__c")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      s"asof: input columns collide with reserved names $reserved")
    require(payload.forall(right.columns.contains),
      s"asof: payload columns $payload must exist on the right side")
    // ALL payload columns ride in ONE struct carried by a single
    // last(ignoreNulls=true): the struct itself is the match marker (it is
    // non-null for every right row even when every payload FIELD is null),
    // so legitimately-null payload values can neither drop a matched left
    // row nor mix payload fields from different right rows.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))))
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__isRight", lit(0))
      .select((Seq("__key", "__t", "__isRight") ++ leftCols).map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__isRight", lit(1))
      .select(Seq(col("__key"), col("__t"), col("__isRight")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(p => col(p).as(p)): _*).as("__p"): _*)
    // Right rows first at equal time → inclusive (<=) semantics.
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__isRight").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isRight") === 0 && col("__c").isNotNull)
      .select(leftCols.map(col) ++
        payload.map(p => col("__c").getField(p).as(p)): _*)
  }

  /** SURVEY §2.2 q20: for each event, the most recent order
    * (o_orderdate ≤ ts) of the matching customer. Orders are deduplicated
    * to one per (custkey, orderdate) — max orderkey — so the as-of pick is
    * deterministic on both engines.
    */
  def eventsToOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables(spark, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asof(events, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_orderdate"))
      .orderBy(col("event_id"))
  }

  /** q20 gate entry: the NATIVE whole-operator implementation
    * (graft.plans.AsOfJoinNative) — one merge sweep over two sorted sides
    * instead of the union+window. Same result as [[eventsToOrders]]
    * (asserted in NativeAsOfJoinSpec and PropertySpec).
    */
  def eventsToOrdersNative(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables(spark, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    graft.plans.AsOfJoinNative.asof(events, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_orderdate"))
      .orderBy(col("event_id"))
  }
}
