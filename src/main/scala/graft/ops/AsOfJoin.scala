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
    * @param left        probe side
    * @param right       reference side (must be deduplicated per
    *                    (key, time) by the caller if determinism matters)
    * @param leftKey     join key column on left
    * @param rightKey    join key column on right
    * @param leftTime    event-time column on left
    * @param rightTime   event-time column on right
    * @param payload     right-side columns to carry onto matching left rows
    * @param direction   "backward" (most recent right at or before the left
    *                    time — the default, DuckDB's ASOF JOIN) or
    *                    "forward" (earliest right at or after — pandas
    *                    merge_asof direction='forward')
    * @param toleranceUs drop matches farther than this many µs from the
    *                    left time (both time columns must be timestamps) —
    *                    pandas merge_asof's `tolerance`. The nearest match
    *                    is picked FIRST and then tested, so this is "the
    *                    as-of neighbor, if close enough", which equals
    *                    "best match within the window" because the as-of
    *                    neighbor is the closest one by construction.
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__key", "__t", "__isRight", "__p", "__c", "__mt")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      s"asof: input columns collide with reserved names $reserved")
    require(payload.forall(right.columns.contains),
      s"asof: payload columns $payload must exist on the right side")
    require(direction == "backward" || direction == "forward",
      s"asof: unknown direction '$direction'")
    // ALL payload columns ride in ONE struct carried by a single
    // last/first(ignoreNulls=true): the struct itself is the match marker
    // (it is non-null for every right row even when every payload FIELD is
    // null), so legitimately-null payload values can neither drop a
    // matched left row nor mix payload fields from different right rows.
    // The matched right TIME rides along as __mt for the tolerance test.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))) :+
        org.apache.spark.sql.types.StructField("__mt",
          right.schema(right.schema.fieldIndex(rightTime)).dataType))
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
        struct(payload.map(p => col(p).as(p)) :+
          col(rightTime).as("__mt"): _*).as("__p"): _*)
    // Backward: right rows first at equal time → inclusive (≤), carry the
    // LAST seen right struct forward. Forward: right rows after left rows
    // at equal time → inclusive (≥), take the FIRST right struct ahead.
    val (w, carried) =
      if (direction == "backward")
        (Window.partitionBy(col("__key"))
          .orderBy(col("__t"), col("__isRight").desc)
          .rowsBetween(Window.unboundedPreceding, 0),
          last(col("__p"), ignoreNulls = true))
      else
        (Window.partitionBy(col("__key"))
          .orderBy(col("__t"), col("__isRight"))
          .rowsBetween(0, Window.unboundedFollowing),
          first(col("__p"), ignoreNulls = true))
    val near = toleranceUs.map { tol =>
      val gap =
        if (direction == "backward")
          graft.functions.epochUs(col("__t")) - graft.functions.epochUs(col("__c").getField("__mt"))
        else
          graft.functions.epochUs(col("__c").getField("__mt")) - graft.functions.epochUs(col("__t"))
      gap <= tol
    }.getOrElse(lit(true))
    l.unionByName(r)
      .withColumn("__c", carried.over(w))
      .filter(col("__isRight") === 0 && col("__c").isNotNull && near)
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

  /** SURVEY §2.2 q69: forward as-of with tolerance — for each VIEW event,
    * the same user's NEXT PURCHASE event (ts ≥ view ts), kept only if it
    * lands within [[Q69ToleranceUs]]: the conversion-attribution shape
    * ("did this session convert within the window?"), pandas merge_asof
    * direction='forward' + tolerance. Same union-trick plan as q20 — one
    * shuffle of |L|+|R|, one sort, no per-key cross product — with the
    * window frame flipped to look ahead. Purchases dedupe to one per
    * (user, ts) — max event_id — so the pick is deterministic.
    */
  val Q69ToleranceUs: Long = 86400L * 1000000L

  def viewsToNextPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_event_id"))
    asof(views, purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTime = "ts", rightTime = "p_ts",
      payload = Seq("p_event_id", "p_ts"),
      direction = "forward", toleranceUs = Some(Q69ToleranceUs))
      .orderBy(col("event_id"))
  }

  val q69Sql: String =
    s"""WITH p AS (SELECT user_id AS p_user, ts AS p_ts, max(event_id) AS p_event_id
      |           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT event_id, user_id, ts, p_event_id, p_ts FROM (
      |  SELECT e.event_id, e.user_id, e.ts, p.p_event_id, p.p_ts,
      |    row_number() OVER (PARTITION BY e.event_id ORDER BY p.p_ts) AS rn
      |  FROM events e JOIN p ON p.p_user = e.user_id
      |    AND p.p_ts >= e.ts
      |    AND epoch_us(p.p_ts) - epoch_us(e.ts) <= ${Q69ToleranceUs}
      |  WHERE e.event_type = 'view')
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

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
