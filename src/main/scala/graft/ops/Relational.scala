package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Pin.Pinned

/** Relational operator library (SURVEY.md §2.2).
  *
  * Numeric-parity policy for the DuckDB oracle: sums over money columns go
  * through exact DECIMAL arithmetic, are rounded at a scale where the true
  * rational value lies exactly on the rounding grid, and are cast to DOUBLE
  * at the output — both engines then produce bit-identical doubles. Ratios
  * (averages) are computed as double-division of those exact components with
  * identical expressions on both sides.
  *
  * Scale notes are inline per query: what broadcasts, what shuffles, and why
  * the plan survives 100 TB.
  */
object Relational {

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(s"decimal(18,$scale)")

  /** l_extendedprice * (1 - l_discount) in exact decimal arithmetic. */
  private def discPrice: Column =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1 shape: scan → filter → groupBy → multi-aggregate.
    * 100 TB: partial aggregation map-side; only |groups| rows shuffle;
    * filter + 7-column projection push down to the parquet scan.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_base_price"),
        round(sum(discPrice), 4).cast("double").as("sum_disc_price"),
        round(sum(discPrice * (lit(1).cast("decimal(18,2)") + dec(col("l_tax")))), 6)
          .cast("double").as("sum_charge"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum($discPriceSql), 4) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum($discPriceSql * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 6) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Selective filter + narrow projection. 100 TB: both the shipdate range
    * predicate and the 5-column ReadSchema reach the parquet scan — no row
    * materializes outside the selected window.
    */
  def q2FilterProject(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
        col("l_quantity") <= 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' AND l_quantity <= 3
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3 shape: 3-way join + agg + top-k.
    * 100 TB: customer is the small side of customer⋈orders (broadcast when
    * filtered segment fits, else shuffle-hash); orders⋈lineitem shuffles on
    * orderkey; top-10 via TakeOrderedAndProject (no global sort).
    */
  def q3JoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val cust = t(spark, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, sfDir, "orders").filter(col("o_orderdate") < cutoff)
    val li = t(spark, sfDir, "lineitem").filter(col("l_shipdate") > cutoff)
    // no broadcast hint on customer: it scales with SF (unbounded at 100×);
    // below the threshold Catalyst/AQE auto-broadcasts the filtered side,
    // above it the join correctly shuffles on o_custkey.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(discPrice), 4).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
      |  CAST(round(sum($discPriceSql), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  /** TPC-H Q5 shape: 5-way star join.
    * 100 TB: region/nation broadcast (tiny); customer⋈orders and
    * orders⋈lineitem shuffle on their keys; agg output is |nations| rows.
    */
  def q4MultiJoin(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      // nation (25 rows) and region (5 rows) are SF-invariant constants —
      // broadcast is size-bounded at any scale
      .join(broadcast(t(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, sfDir, "region")).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(discPrice), 4).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  val q4Sql: String =
    s"""SELECT n_name,
      |  CAST(round(sum($discPriceSql), 4) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Global top-k with tiebreakers. 100 TB: planner emits
    * TakeOrderedAndProject — per-partition heaps, k rows to the driver, no
    * global sort.
    */
  def q5SortLimit(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  val q5Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Distinct counts. 100 TB: countDistinct expands to a two-phase partial
    * distinct (map-side dedup before shuffle). approx_count_distinct (HLL)
    * is the cheap path at scale — exercised in the spec, not the oracle.
    */
  def q6Distinct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("total_rows"))

  val q6Sql: String =
    """SELECT count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps,
      |  count(*) AS total_rows FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Top-5 customers per segment by balance (window rank).
    * 100 TB: one shuffle on the partition key; row_number with a full
    * tiebreak keeps output deterministic.
    */
  def q7WindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, sfDir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rn"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val q7Sql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) WHERE rn <= 5
      |ORDER BY c_mktsegment, rn""".stripMargin

  // ---------------------------------------------------------------- q8
  /** Running sum + lag deltas per supplier over ship time.
    * 100 TB: single shuffle by suppkey; running frame is streaming within
    * each sorted partition. Skewed suppliers would need key-splitting with a
    * second pass (documented, not needed at this cardinality).
    */
  def q8WindowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique at sf0.1 (the generator
    // reuses keys across SF scale-up; 118k duplicate pairs, and one
    // full-key tie inside a suppkey partition with DIFFERENT quantities —
    // engine-dependent tie order then changes the running sums; caught by
    // the full sf0.1 oracle sweep, invisible at sf0.001/sf0.01). Appending
    // l_quantity to the ordering makes any remaining tie quantity-equal,
    // which leaves every prefix sum invariant under tie permutation.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    t(spark, sfDir, "lineitem")
      .withColumn("run_qty",
        sum(dec(col("l_quantity"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .withColumn("gap_days",
        coalesce(datediff(col("l_shipdate").cast("date"),
          lag(col("l_shipdate"), 1).over(w).cast("date")), lit(-1)))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("run_qty"), col("gap_days"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
  }

  val q8Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_qty,
      |  coalesce(date_diff('day',
      |    CAST(lag(l_shipdate, 1) OVER w AS DATE),
      |    CAST(l_shipdate AS DATE)), -1) AS gap_days
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q9
  /** EXISTS via left-semi join. 100 TB: semi-join needs only the key column
    * of the right side; broadcast when the distinct keyset fits.
    */
  def q9SemiJoin(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  val q9Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** NOT EXISTS via left-anti join: customers with no large order.
    * (Every customer has *some* order in this data, so the anti-join is
    * against the filtered subquery to keep the result non-trivial.)
    */
  def q10AntiJoin(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders").filter(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Union of two filtered branches + aggregate. 100 TB: both branches scan
    * with pushed filters; union is metadata-only (no shuffle) before agg.
    */
  def q11UnionAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val big = o.filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), lit("big").as("tag"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("tag"))
    big.unionAll(urgent)
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"), countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("tag"))
  }

  val q11Sql: String =
    """SELECT tag, count(*) AS n, count(DISTINCT o_orderkey) AS n_orders FROM (
      |  SELECT o_orderkey, 'big' AS tag FROM orders WHERE o_totalprice > 400000
      |  UNION ALL
      |  SELECT o_orderkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
      |) GROUP BY tag ORDER BY tag""".stripMargin

  // ---------------------------------------------------------------- q12
  /** ROLLUP hierarchy totals; NULL group markers coalesced to 'ALL' so the
    * oracle compare never faces NULL-ordering differences.
    */
  def q12Rollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))

  val q12Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // ---------------------------------------------------------------- q13
  /** CUBE over two dims. */
  def q13Cube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("o_totalprice"))), 2).cast("double").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  val q13Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Pivot event_type → columns. Spark's pivot with an explicit value list
    * compiles to one pass of conditional aggregation (no extra shuffle vs a
    * plain groupBy).
    */
  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q14Pivot(spark: SparkSession, sfDir: String): DataFrame = {
    val pivoted = t(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    eventTypes.foldLeft(pivoted) { (df, et) =>
      df.withColumn(et, coalesce(col(et), lit(0L)))
    }.orderBy(col("user_id"))
  }

  val q14Sql: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q15
  /** String functions: upper/length/regexp_extract/concat/LIKE — all
    * codegen'd expressions inside one WholeStageCodegen span.
    */
  def q15StringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .filter(col("p_name").like("%e%"))
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
        concat_ws("/", col("p_type"), col("p_brand")).as("type_brand"))
      .orderBy(col("p_partkey"))

  val q15Sql: String =
    """SELECT p_partkey, upper(p_name) AS uname, length(p_name) AS name_len,
      |  CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
      |  concat_ws('/', p_type, p_brand) AS type_brand
      |FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Monthly revenue series via date_trunc. */
  def q16DateAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(round(sum(dec(col("o_totalprice"))), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("month"))

  val q16Sql: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  // ---------------------------------------------------------------- q17
  /** TPC-H Q17 shape: compare each row against its group's average.
    * Spark-first: the correlated scalar subquery is expressed as a pre-agg +
    * join (what a good optimizer decorrelates to anyway). 100 TB: the
    * per-part average side is |part| rows — UNBOUNDED, so no broadcast
    * hint: both sides shuffle on l_partkey (the pre-agg already sits on
    * that key) and AQE promotes to broadcast only when the agg actually
    * fits.
    */
  def q17ScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("total_price"),
        count(lit(1)).as("n"))
  }

  val q17Sql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
      |  count(*) AS n
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS ap_partkey,
      |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
      |      FROM lineitem GROUP BY l_partkey) a
      |  ON l.l_partkey = a.ap_partkey
      |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin

  // ---------------------------------------------------------------- q18
  /** IN (subquery) via semi-join + aggregate. */
  def q18InSubquery(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "customer").filter(col("c_mktsegment") === "MACHINERY"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("o_totalprice"))), 2).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))

  val q18Sql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Non-equi interval (range) join against a tiny bands relation.
    * 100 TB: the bands side is literal/small → broadcast nested loop with a
    * range predicate; the big side streams through once. For big-big range
    * joins the scale path is bucketing both sides by floor(value/width) and
    * equi-joining on bucket ± 1 (documented in SURVEY §5).
    */
  val priceBands: Seq[(Int, Double, Double)] = Seq(
    (0, 900.0, 925.0), (1, 925.0, 950.0), (2, 950.0, 975.0), (3, 975.0, 1000.0))

  def q19RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = priceBands.toDF("band", "lo", "hi")
    t(spark, sfDir, "part")
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("p_retailprice"))), 2).cast("double").as("sum_price"))
      .orderBy(col("band"))
  }

  val q19Sql: String =
    """SELECT band, count(*) AS n,
      |  CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
      |FROM part
      |JOIN (SELECT * FROM (VALUES (0, 900.0, 925.0), (1, 925.0, 950.0),
      |      (2, 950.0, 975.0), (3, 975.0, 1000.0)) AS t(band, lo, hi)) b
      |  ON p_retailprice >= b.lo AND p_retailprice < b.hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q20
  /** As-of join: for each event, the most recent order (by o_orderdate ≤ ts)
    * of the same user/customer. Spark lacks a native as-of join; the
    * scalable composition is the union trick: tag both sides, union, sort
    * within each key partition, carry the last seen right-side row forward.
    * One shuffle, no cross product — survives 100 TB on both sides.
    * Oracle uses DuckDB's native ASOF JOIN as an independent check.
    */
  def q20AsOfJoin(spark: SparkSession, sfDir: String): DataFrame =
    AsOfJoin.eventsToOrdersNative(spark, sfDir)

  val q20Sql: String =
    """SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
      |FROM events e
      |ASOF JOIN (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      |           FROM orders GROUP BY o_custkey, o_orderdate) o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Top-3 lineitems per returnflag (top-k per group). With only 3 group
    * keys a naive window would shuffle everything onto 3 tasks; Spark 4's
    * WindowGroupLimit rewrite inserts a PARTIAL top-3 filter per input
    * partition BEFORE the exchange (and a final one after), so the plain
    * declarative window IS the two-phase plan — only ≤3·P·G survivors
    * shuffle. (Round 1 hand-built the two-phase via spark_partition_id;
    * the optimizer's rewrite does it with one window and one shuffle.)
    */
  def q21TopKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(ord: _*)
    t(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  val q21Sql: String =
    """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) WHERE rn <= 3
      |ORDER BY l_returnflag, rn""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Exact percentiles per group (median + p90). Both engines linearly
    * interpolate; inputs are 2-decimal data so interpolated values land on a
    * ≤3-decimal grid and round(4) is exact on both sides.
    */
  def q22Percentile(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val q22Sql: String =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Fixed-width histogram via integer bucketing — single agg pass, no
    * width_bucket dependency (floor division is portable).
    */
  def q23Histogram(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("o_totalprice"))), 2).cast("double").as("sum_price"))
      .orderBy(col("bucket"))

  val q23Sql: String =
    """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Gap-based sessionization (30-min inactivity). One shuffle by user;
    * two stacked windows (lag → cumulative sum of session-start flags)
    * evaluate in a single sort per partition.
    */
  def q24Sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, sfDir, "events")
      .withColumn("prev_ms", lag(graft.functions.epochMs(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull ||
          graft.functions.epochMs(col("ts")) - col("prev_ms") > 30L * 60 * 1000, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q24Sql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM (
      |  SELECT user_id, ts, event_id,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 30*60*1000
      |           THEN 1 ELSE 0 END AS new_session
      |    FROM (SELECT user_id, ts, event_id,
      |            lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id
      |              ORDER BY ts, event_id) AS prev_ms
      |          FROM events)))
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q25
  /** High-cardinality aggregation, computed through an explicit salted
    * two-phase plan (salt → partial agg → final agg). Result is identical
    * to a plain groupBy; the shape is the scale path for skewed keys where
    * AQE's skew handling isn't enough. Distinct-set union via flatten +
    * array_distinct keeps phase 2 associative.
    */
  def q25SkewAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(dec(col("value"))).as("psum"),
        collect_set(col("event_type")).as("ptypes"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n"),
        round(sum(col("psum")), 2).cast("double").as("sum_value"),
        size(array_distinct(flatten(collect_list(col("ptypes"))))).as("n_types"))
      .orderBy(col("user_id"))

  val q25Sql: String =
    """SELECT user_id, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
      |  CAST(count(DISTINCT event_type) AS INT) AS n_types
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Explicit GROUPING SETS via the SQL front-end over registered views. */
  def q26GroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  val q26Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin


  // ---------------------------------------------------------------- q27
  /** Explode/unnest: token frequencies via generator + agg. 100 TB: the
    * generator runs inside the scan stage (no materialized exploded table);
    * the agg shuffles one (token, partial_count) row per distinct token per
    * partition.
    */
  def q27Explode(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val q27Sql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Null-handling surface: nullif / coalesce / conditional defaults. */
  def q28NullOps(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_c"),
        when(col("o_totalprice") > 250000, col("o_totalprice")).otherwise(lit(null))
          .as("big_price"))
      .groupBy(col("status_c"))
      .agg(count(lit(1)).as("n"),
        count(col("big_price")).as("n_big"),
        round(sum(dec(coalesce(col("big_price"), lit(0)))), 2).cast("double").as("big_sum"))
      .orderBy(col("status_c"))

  val q28Sql: String =
    """SELECT status_c, count(*) AS n, count(big_price) AS n_big,
      |  CAST(round(sum(CAST(coalesce(big_price, 0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS big_sum
      |FROM (SELECT o_orderkey,
      |        coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_c,
      |        CASE WHEN o_totalprice > 250000 THEN o_totalprice END AS big_price
      |      FROM orders)
      |GROUP BY status_c ORDER BY status_c""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Ranking-window statistics: ntile / percent_rank / cume_dist. */
  def q29WindowStats(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  val q29Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM orders WHERE o_orderkey < 2000
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q30
  /** Set operations: INTERSECT / EXCEPT between yearly customer sets. */
  def q30SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    def custs(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val both = custs(1996).intersect(custs(1997))
      .agg(count(lit(1)).as("n")).select(lit("both").as("tag"), col("n"))
    val only96 = custs(1996).except(custs(1997))
      .agg(count(lit(1)).as("n")).select(lit("only_1996").as("tag"), col("n"))
    both.unionAll(only96).orderBy(col("tag"))
  }

  val q30Sql: String =
    """SELECT 'both' AS tag, count(*) AS n FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |  INTERSECT
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |UNION ALL
      |SELECT 'only_1996' AS tag, count(*) AS n FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |ORDER BY tag""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Full-outer join match categories. */
  def q31OuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer").select(col("c_custkey"))
    val o = t(spark, sfDir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_custkey")).distinct()
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(when(col("c_custkey").isNull, "order_only")
        .when(col("o_custkey").isNull, "cust_only")
        .otherwise("both").as("side"))
      .groupBy(col("side")).agg(count(lit(1)).as("n"))
      .orderBy(col("side"))

  }

  val q31Sql: String =
    """SELECT side, count(*) AS n FROM (
      |  SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
      |              WHEN o_custkey IS NULL THEN 'cust_only'
      |              ELSE 'both' END AS side
      |  FROM customer
      |  FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders
      |                   WHERE o_totalprice > 400000) o
      |    ON c_custkey = o_custkey)
      |GROUP BY side ORDER BY side""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Exact math scalar functions (sqrt/abs/ceil/floor/mod — IEEE-exact on
    * both engines, no libm dependency).
    */
  def q32MathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        round(sqrt(col("o_totalprice")), 6).as("sqrt_p"),
        abs(col("o_totalprice") - 250000).as("dist_mid"),
        ceil(col("o_totalprice") / 1000).cast("long").as("k_ceil"),
        floor(col("o_totalprice") / 1000).cast("long").as("k_floor"),
        pmod(col("o_orderkey"), lit(7)).as("mod7"))
      .orderBy(col("o_orderkey"))

  val q32Sql: String =
    """SELECT o_orderkey,
      |  round(sqrt(o_totalprice), 6) AS sqrt_p,
      |  abs(o_totalprice - 250000) AS dist_mid,
      |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS k_ceil,
      |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS k_floor,
      |  o_orderkey % 7 AS mod7
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Semi-structured: JSON field extraction from the events props column. */
  def q33Json(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q33Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Calendar extraction: year / quarter / month grouping. */
  def q34DateParts(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("o_totalprice"))), 2).cast("double").as("revenue"))
      .orderBy(col("y"), col("q"))

  val q34Sql: String =
    """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1, 2 ORDER BY y, q""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Moving average over a rows frame. The average is computed as exact
    * decimal moving-sum divided by the frame row count (both engines would
    * otherwise disagree on avg(decimal) result types).
    */
  def q35MovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(-3, 0)
    t(spark, sfDir, "lineitem")
      .filter(col("l_suppkey") <= 2)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(dec(col("l_quantity"))).over(w).cast("double") /
          count(lit(1)).over(w), 6).as("mavg_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val q35Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |        / count(*) OVER w, 6) AS mavg_qty
      |FROM lineitem WHERE l_suppkey <= 2
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber
      |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Custom typed aggregate (Aggregator API): geometric mean of order
    * totals per status. exp/ln cross-engine noise is ~1e-11 relative —
    * round(4) on a ~1e5 value absorbs it.
    */
  def q36GeomMean(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(round(graft.functions.GeomMean.column(col("o_totalprice")), 4)
        .as("geo_mean"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val q36Sql: String =
    """SELECT o_orderstatus,
      |  round(exp(avg(ln(o_totalprice))), 4) AS geo_mean,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin


  // ---------------------------------------------------------------- q37
  /** TPC-H Q22 shape: customers above the global average balance with no
    * recent orders. The global average is a 1-row broadcast (exact decimal
    * sum / count, identical double both sides); the NOT EXISTS is an
    * anti-join.
    */
  def q37AboveAvgInactive(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
    cust.join(broadcast(avgBal), lit(true))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(dec(col("c_acctbal"))), 2).cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q37Sql: String =
    """SELECT c_mktsegment, count(*) AS n_cust,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |                          / count(*)
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q38
  /** TPC-H Q2 shape: argmin per group via pre-aggregated self-join (the
    * decorrelated form of a correlated min subquery): the poorest customer
    * of each nation, custkey tiebreak.
    */
  def q38ArgminPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
    val minBal = cust.groupBy(col("c_nationkey").as("mk"))
      .agg(min(col("c_acctbal")).as("min_bal"))
    val winner = cust
      // minBal is one row per nation (≤25, SF-invariant) — bounded broadcast
      .join(broadcast(minBal),
        col("c_nationkey") === col("mk") && col("c_acctbal") === col("min_bal"))
      .groupBy(col("c_nationkey"), col("c_acctbal"))
      .agg(min(col("c_custkey")).as("c_custkey"))
    winner
      // nation is 25 rows at any SF — bounded broadcast
      .join(broadcast(t(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal").as("min_bal"))
      .orderBy(col("n_name"))
  }

  val q38Sql: String =
    """SELECT n_name, c_custkey, min_bal FROM (
      |  SELECT c.c_nationkey, c.c_acctbal AS min_bal, min(c.c_custkey) AS c_custkey
      |  FROM customer c
      |  JOIN (SELECT c_nationkey AS mk, min(c_acctbal) AS mb
      |        FROM customer GROUP BY c_nationkey) m
      |    ON c.c_nationkey = m.mk AND c.c_acctbal = m.mb
      |  GROUP BY c.c_nationkey, c.c_acctbal)
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY n_name""".stripMargin


  // ---------------------------------------------------------------- q39
  /** GROUP BY … HAVING: segments whose average balance clears a floor.
    * HAVING is a post-aggregation filter — no extra pass.
    */
  def q39Having(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
      .filter(col("avg_bal") > 4000)
      .select(col("c_mktsegment"), col("n"), round(col("avg_bal"), 6).as("avg_bal"))
      .orderBy(col("c_mktsegment"))

  val q39Sql: String =
    """SELECT c_mktsegment, n, round(avg_bal, 6) AS avg_bal FROM (
      |  SELECT c_mktsegment, count(*) AS n,
      |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
      |  FROM customer GROUP BY c_mktsegment)
      |WHERE avg_bal > 4000
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q40
  /** TPC-H Q4 shape: EXISTS-driven aggregate — orders having at least one
    * deep-discount item and at least one bulk item, counted by priority.
    * Both EXISTS become left-semi joins on the orderkey (each needs only
    * the key column of lineitem — minimal shuffle).
    */
  def q40ExistsAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    t(spark, sfDir, "orders")
      .join(li.filter(col("l_discount") >= 0.08).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .join(li.filter(col("l_quantity") >= 45).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val q40Sql: String =
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin


  // ---------------------------------------------------------------- q41
  /** RANGE interval frame: per-customer order totals summed over a sliding
    * 90-day event-time window (range frame = value-based bounds, unlike
    * q35's row-count frame). One shuffle by customer; frames evaluate
    * streaming over each sorted partition.
    */
  def q41RangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-90L * 24 * 3600, 0)
    t(spark, sfDir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(dec(col("o_totalprice"))).over(w), 2).cast("double")
          .as("sum_90d"),
        count(lit(1)).over(w).as("n_90d"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q41Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS sum_90d,
      |  count(*) OVER w AS n_90d
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin


  // ---------------------------------------------------------------- q42
  /** Bag-semantics set operations: INTERSECT ALL / EXCEPT ALL preserve
    * multiplicities (they de-sugar to count-based joins, unlike the
    * distinct-based q30 variants).
    */
  def q42BagSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val a = li.filter(col("l_quantity") >= 25).select(col("l_partkey"))
    val b = li.filter(col("l_discount") >= 0.05).select(col("l_partkey"))
    val inter = a.intersectAll(b).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    val exc = a.exceptAll(b).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    inter.unionAll(exc).orderBy(col("op"))
  }

  val q42Sql: String =
    """SELECT 'except_all' AS op, count(*) AS n FROM (
      |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
      |  EXCEPT ALL
      |  SELECT l_partkey FROM lineitem WHERE l_discount >= 0.05)
      |UNION ALL
      |SELECT 'intersect_all' AS op, count(*) AS n FROM (
      |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
      |  INTERSECT ALL
      |  SELECT l_partkey FROM lineitem WHERE l_discount >= 0.05)
      |ORDER BY op""".stripMargin


  // ---------------------------------------------------------------- q43
  /** Correlated LATERAL subquery: top-2 customers per nation by balance —
    * the SQL-level dual of the q21 window pattern (the optimizer
    * decorrelates the per-row subquery into a ranked join).
    */
  def q43Lateral(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c.c_acctbal DESC, c.c_custkey""".stripMargin)
  }

  val q43Sql: String =
    """SELECT n_name, c.c_custkey, c.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
      |ORDER BY n_name, c.c_acctbal DESC, c.c_custkey""".stripMargin


  // ---------------------------------------------------------------- q44
  /** first_value / last_value with IGNORE NULLS over a full-partition
    * frame: each lineitem carries its supplier's first and latest BIG
    * shipment price (nulls for non-big rows are skipped by the frame walk).
    */
  def q44FirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val big = when(col("l_extendedprice") > 80000, col("l_extendedprice"))
    t(spark, sfDir, "lineitem")
      .filter(col("l_suppkey") <= 2)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        first(big, ignoreNulls = true).over(w).as("first_big"),
        last(big, ignoreNulls = true).over(w).as("last_big"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val q44Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  first_value(big IGNORE NULLS) OVER w AS first_big,
      |  last_value(big IGNORE NULLS) OVER w AS last_big
      |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      |        CASE WHEN l_extendedprice > 80000 THEN l_extendedprice END AS big
      |      FROM lineitem WHERE l_suppkey <= 2)
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin


  // ---------------------------------------------------------------- q45
  /** UNPIVOT (wide → long) via the native Dataset.unpivot operator, then
    * per-metric aggregation — the inverse of q14's pivot.
    */
  def q45Unpivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "metric",
        valueColumnName = "value")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total"))
      .orderBy(col("metric"))

  val q45Sql: String =
    """SELECT metric, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      |FROM (
      |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
      |GROUP BY metric ORDER BY metric""".stripMargin


  // ---------------------------------------------------------------- q46
  /** Weighted average with exact-decimal numerator/denominator (quantity-
    * weighted unit price per return flag) — the ratio is a double division
    * of two exact decimal sums, identical on both engines.
    */
  def q46WeightedAvg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).cast("double")
        / sum(dec(col("l_quantity"))).cast("double"), 6).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q46Sql: String =
    """SELECT l_returnflag,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |        / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS wavg_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q47
  /** BIG-BIG range join — the scale path q19's scaladoc documents, shipped:
    * orders self-joined on price proximity (|pa − pb| ≤ δ). Bucketing both
    * sides by floor(price/δ) and exploding ONE side to bucket ± 1 turns the
    * non-equi predicate into an equi-join on bucket: each true pair meets
    * in exactly one bucket (the exploded neighbor set is distinct), shuffle
    * volume is O(n·3), and no nested-loop join appears at any size.
    * Gap sums are exact decimals (2-dec inputs), so parity is exact.
    */
  val RangeDelta = 1.0

  def q47BucketRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), dec(col("o_totalprice")).as("pd"))
      .withColumn("p", col("pd").cast("double"))
    val a = o.withColumn("bucket", floor(col("p") / RangeDelta).cast("long"))
    val b = o
      .select(col("k").as("k2"), col("pd").as("pd2"), col("p").as("p2"))
      .withColumn("b0", floor(col("p2") / RangeDelta).cast("long"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
    a.join(b, Seq("bucket"))
      .filter(col("k") < col("k2") && abs(col("p") - col("p2")) <= RangeDelta)
      .groupBy(floor(col("p") / 10000).cast("long").as("band"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(abs(col("pd") - col("pd2"))).cast("double")
          / count(lit(1)), 6).as("avg_gap"))
      .orderBy(col("band"))
  }

  val q47Sql: String =
    s"""SELECT CAST(floor(a.p / 10000) AS BIGINT) AS band, count(*) AS n_pairs,
      |  round(CAST(sum(abs(a.pd - b.pd)) AS DOUBLE) / count(*), 6) AS avg_gap
      |FROM (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS pd,
      |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p FROM orders) a
      |JOIN (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS pd,
      |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS p FROM orders) b
      |  ON a.k < b.k AND abs(a.p - b.p) <= $RangeDelta
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Salted skew join — the explicit hot-key mitigation when AQE's runtime
    * skew split isn't available (e.g. a stream-static join): the probe side
    * derives a deterministic salt from its row id, the build side replicates
    * across all salts, and the join key becomes (key, salt) so one hot user
    * spreads over NSalts tasks. The oracle runs the PLAIN join — proof the
    * salting is semantically invisible.
    */
  val NSalts = 8

  def q48SaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val salted = t(spark, sfDir, "orders")
      .select(col("o_custkey"), dec(col("o_totalprice")).as("pd"))
      .withColumn("o_salt", explode(array((0 until NSalts).map(lit): _*)))
    t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("salt", (col("event_id") % NSalts).cast("int"))
      .join(salted,
        col("user_id") === col("o_custkey") && col("o_salt") === col("salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("pd")), 2).cast("double").as("sum_price"))
      .orderBy(col("event_type"))
  }

  val q48Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
      |FROM events JOIN orders ON user_id = o_custkey
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Bucketed co-located join — the REPEATED-join amortization at 100 TB:
    * write both fact tables bucketed AND per-bucket sorted by the join key
    * once, and every later join on that key reads pre-shuffled, pre-sorted
    * data — the SortMergeJoin plans with ZERO exchange and ZERO sort on
    * either side (asserted in PlanInvariantsSpec). The pre-write
    * `repartition(NBuckets, key)` matches the bucket hash-partitioning so
    * each bucket lands in exactly one file, which is what lets the scan
    * report its sort order (exchange elimination needs no conf; the
    * sort elimination additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, off by
    * default since 3.0 because it lists files at planning time — set it
    * when bucket-sorted reads matter). The oracle runs the PLAIN join on
    * the raw parquet — bucketing is semantically invisible, like q48's
    * salt.
    * 100 TB: bucket count scales to data/bucket-target (e.g. 2^10–2^12);
    * the one-time bucketed write costs a single shuffle, then N downstream
    * joins/aggregations on the key are all exchange-free.
    */
  val NBuckets = 8

  /** SESSION-GLOBAL, planning-only conf required for the zero-SORT half of
    * the bucketed-join plan: with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` a bucketed
    * scan reports its per-bucket sort order (valid here because
    * [[bucketedTable]] writes each bucket as exactly one file). Exchange
    * elimination needs no conf; only sort elimination does. Centralized
    * here — NOT buried in the table builder — so the mutation is explicit:
    * it affects every bucketed scan in the session (all of them graft's,
    * all single-file-per-bucket, so the order it reports is always
    * truthful), it logs when it actually flips the value, and it
    * tolerates the legacy conf disappearing in a future Spark release
    * (PlanInvariantsSpec's fresh-session zero-sort assertion is the
    * tripwire that would catch a silent removal).
    */
  def ensureBucketSortOrdering(spark: SparkSession): Unit = {
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    try if (!spark.conf.get(key, "false").toBoolean) {
      spark.conf.set(key, "true")
      System.err.println(s"[graft] set session conf $key=true " +
        "(bucketed scans report per-bucket sort order; planning-only)")
    } catch { case _: Exception => System.err.println(
      s"[graft] could not set $key — bucketed joins will keep a " +
        "per-query sort (results unaffected)") }
  }

  /** Write-once (per session+SF) bucketed copy of a table, keyed by `key`.
    *
    * The cache name embeds the sanitized source path PLUS an md5 of the
    * raw path — two different data dirs can never alias one cached table
    * (a 32-bit hashCode could collide). The cache assumes the input data
    * at `sfDir` is immutable within the session — re-writing the source
    * files at the same path requires a new session (or dropping the
    * table) to pick up the change.
    *
    * Sort-elimination needs `bucketedTableScan.outputOrdering`; set it
    * HERE so a fresh session gets the zero-sort plan without manual conf
    * (it is planning-only: the scan reports its per-bucket sort order,
    * valid because the write above puts each bucket in exactly one file).
    */
  def bucketedTable(spark: SparkSession, sfDir: String, table: String,
      key: String): DataFrame = {
    ensureBucketSortOrdering(spark)
    // production sizes buckets to data/bucket-target (2^10-2^12 at 100 TB);
    // the bucket count is part of the cache key so re-tuning mid-session
    // can never serve a stale layout. The pid tag keeps two CONCURRENT
    // JVMs sharing one warehouse dir from racing each other's
    // delete/saveAsTable on the same managed location (the in-memory
    // catalog is per-session anyway, so the cache loses nothing).
    val n = graft.functions.confInt(spark, "spark.graft.buckets", NBuckets)
    val name = s"graft_b_${table}_${n}_p${ProcessHandle.current().pid()}_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    if (!spark.catalog.tableExists(name)) {
      // the in-memory catalog forgets tables across sessions but their
      // managed location persists — a leftover directory fails the create
      // with LOCATION_ALREADY_EXISTS, so clear it first
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name)
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.delete(warehouse, true)
      t(spark, sfDir, table)
        .repartition(n, col(key))
        .write.bucketBy(n, key).sortBy(key)
        .mode("overwrite").format("parquet").saveAsTable(name)
    }
    spark.table(name)
  }

  def q49BucketedJoin(spark: SparkSession, sfDir: String): DataFrame =
    bucketedTable(spark, sfDir, "lineitem", "l_orderkey")
      .join(bucketedTable(spark, sfDir, "orders", "o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(discPrice), 2).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))

  val q49Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n,
      |  CAST(round(sum($discPriceSql), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Changelog (CDC) compaction — the upsert/SCD-Type-1 primitive: treat
    * `events` as a keyed change stream and keep only the LATEST row per
    * (user_id, event_type) key, ordered by (ts, event_id) with the unique
    * event_id as the deterministic tiebreak; n_updates reports how many
    * versions were compacted away. This is the batch form of Kafka log
    * compaction / Delta MERGE latest-wins.
    * 100 TB: expressed as max(struct(ts, event_id, payload)) — a plain
    * aggregation, so the map side pre-compacts each partition to its local
    * latest row per key and the ONE shuffle carries O(live keys), not the
    * changelog (a window row_number formulation cannot do this here: the
    * partition-wide n_updates count pins every row through the sort). The
    * struct ordering is field-lexicographic, and (ts, event_id) is unique,
    * so the trailing payload field can never influence the argmax. The
    * oracle recomputes independently via window row_number.
    */
  def q50CdcCompact(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("value"))).as("m"),
        count(lit(1)).as("n_updates"))
      .select(col("user_id"), col("event_type"),
        col("m.event_id").as("last_event_id"), col("m.ts").as("last_ts"),
        col("m.value").as("last_value"), col("n_updates"))
      .orderBy(col("user_id"), col("event_type"))

  val q50Sql: String =
    """SELECT user_id, event_type, last_event_id, last_ts, last_value, n_updates
      |FROM (
      |  SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts,
      |    value AS last_value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id, event_type) AS n_updates
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q51
  /** TPC-H Q21 shape (sole-blame suppliers): returned lines (l1, flag 'R')
    * in multi-supplier orders — EXISTS another supplier's line in the same
    * order — where NO other supplier's line was returned (NOT EXISTS), i.e.
    * this supplier alone "failed" a shared order; count per supplier, top
    * 10. The exists/not-exists pair over the SAME fact table is the classic
    * big-big semi + anti self-join.
    * 100 TB: all three lineitem branches hash-partition on l_orderkey, so
    * the semi and anti run as co-partitioned SortMergeJoins (at toy SF they
    * broadcast — both are the right call at their size); the supplier name
    * join broadcasts (bounded dim); final top-10 is TakeOrderedAndProject,
    * no global sort.
    */
  def q51SoleBlame(spark: SparkSession, sfDir: String): DataFrame = {
    val l = t(spark, sfDir, "lineitem")
    val l1 = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val othersR = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    l1
      .join(others,
        col("l_orderkey") === col("o2") && col("s2") =!= col("l_suppkey"),
        "left_semi")
      .join(othersR,
        col("l_orderkey") === col("o3") && col("s3") =!= col("l_suppkey"),
        "left_anti")
      .join(broadcast(t(spark, sfDir, "supplier")), // bounded dim at any SF
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val q51Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q52
  /** TPC-H Q11 shape (value-share filter): per-part revenue HAVING more
    * than 1.25× the average per-part revenue. The threshold compare is
    * multiply-only in DECIMAL — v·nparts·4 > total·5 — so both engines
    * decide every boundary case identically (no decimal division, no float
    * epsilon), and it is scale-free (a fixed fraction-of-total threshold
    * degenerates as the part count grows).
    * 100 TB: one shuffle for the per-part agg; the (total, nparts) pair is
    * a 1-row aggregate broadcast into a map-side filter.
    */
  def q52ValueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val perPart = t(spark, sfDir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(discPrice).as("v"))
    val totals = perPart.agg(sum(col("v")).as("tot"), count(lit(1)).as("nparts"))
    perPart.join(broadcast(totals), lit(true)) // 1-row aggregate
      .filter(col("v") * col("nparts") * 4 > col("tot") * 5)
      .select(col("l_partkey"), round(col("v"), 2).cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q52Sql: String =
    s"""WITH pv AS (
      |  SELECT l_partkey, sum($discPriceSql) AS v
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
      |FROM pv
      |WHERE v * (SELECT count(*) FROM pv) * 4 > (SELECT sum(v) FROM pv) * 5
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------- q54
  /** TPC-H Q13 shape (distribution of group sizes): orders per customer —
    * LEFT OUTER so customers with zero orders appear — then the histogram
    * of those counts. The double aggregation is the shape that matters:
    * first agg shuffles on the join/grouping key, second agg runs over
    * |distinct counts| rows (tiny at any scale).
    * 100 TB: customer⋈orders co-partitions on custkey (one exchange each
    * side with AQE); the count histogram is a near-free second pass.
    */
  def q54CountDistribution(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q54Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q57
  /** TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning both
    * join sides — the disjunctive-pushdown test. Catalyst extracts the
    * common per-side conjuncts out of the disjunction (brand set and the
    * covering size/quantity bounds) and pushes them below the join, so
    * each side scans a fraction of its table before the residual OR runs.
    * 100 TB: the join itself is partkey-equi (broadcast part at this SF).
    */
  def q57DisjunctivePredicate(spark: SparkSession, sfDir: String): DataFrame = {
    val branch = (brand: String, szHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand &&
        col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "part"), col("p_partkey") === col("l_partkey"))
      .filter(branch("Brand#1", 15, 1, 20) ||
        branch("Brand#2", 25, 10, 30) ||
        branch("Brand#3", 35, 20, 40))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  val q57Sql: String =
    s"""SELECT CAST(round(sum($discPriceSql), 2) AS DOUBLE) AS revenue, count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // ---------------------------------------------------------------- q58
  /** TPC-H Q18 shape (large-volume orders): IN over a HAVING subquery —
    * orders whose lineitems sum past a quantity threshold, joined back for
    * the order payload, top 10 by volume. The IN-HAVING compiles to an
    * aggregate + equi-join (never a correlated loop).
    * 100 TB: the qty aggregate shuffles on l_orderkey once; the join back
    * to orders reuses the same key partitioning; top-10 is
    * TakeOrderedAndProject. DECIMAL > INT threshold compare is exact.
    */
  def q58LargeVolumeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = t(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 150)
    t(spark, sfDir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        round(col("qty"), 2).cast("double").as("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(10)
  }

  val q58Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CAST(round(qty, 2) AS DOUBLE) AS sum_qty
      |FROM orders JOIN (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem GROUP BY l_orderkey HAVING qty > 150) big
      |  ON o_orderkey = big.l_orderkey
      |ORDER BY sum_qty DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q55
  /** TPC-H Q15 shape (top-revenue supplier with TIES-ALL semantics): an
    * aggregated revenue view, then every supplier whose revenue EQUALS the
    * global max — not top-1-with-tiebreak, the equality keeps all
    * co-maxima, which is why the compare must be exact (DECIMAL = DECIMAL,
    * no float epsilon, both engines decide ties identically).
    * 100 TB: one shuffle for the revenue agg; the max is a 1-row broadcast
    * into a map-side equality filter.
    */
  def q55TopRevenueSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val revenue = t(spark, sfDir, "lineitem")
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice).as("rev"))
    val mx = revenue.agg(max(col("rev")).as("mx"))
    t(spark, sfDir, "supplier")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(mx), lit(true)) // 1-row aggregate
      .filter(col("rev") === col("mx"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev"), 2).cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q55Sql: String =
    s"""WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no, sum($discPriceSql) AS rev
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(round(rev, 2) AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE rev = (SELECT max(rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q56
  /** TPC-H Q16 shape: distinct supplier counts per part attribute group,
    * with a NOT IN exclusion subquery. NOT IN compiles to a left-anti join,
    * which is equivalent ONLY because s_suppkey is non-null (a NULL in the
    * subquery would empty a SQL NOT IN — kept out of scope by schema).
    * 100 TB: part attributes prune map-side, the exclusion list is a
    * broadcast anti, countDistinct shuffles (group, suppkey) pairs.
    */
  def q56SupplierCnt(spark: SparkSession, sfDir: String): DataFrame = {
    val excluded = t(spark, sfDir, "supplier")
      .filter(col("s_acctbal") < 2000).select(col("s_suppkey"))
    t(spark, sfDir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 9, 13))
      .join(t(spark, sfDir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(20)
  }

  val q56Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Data profiling — the ANALYZE/summary surface a pipeline framework
    * owes its users: per-column row count, non-null count, exact distinct
    * count, and numeric min/max, in ONE pass. Spark plans the multiple
    * count(DISTINCT) aggregates via a single scan + Expand (|cols|× row
    * multiplication map-side, one shuffle) — the scalable profile shape;
    * the wide 1-row aggregate then unpivots to one row per column with
    * `stack`. The nullable derived column exercises the null accounting.
    */
  def q53Profile(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
      .withColumn("o_prio_opt", nullif(col("o_orderpriority"), lit("1-URGENT")))
    val stats = o.agg(
      count(lit(1)).as("n"),
      count(col("o_orderkey")).as("nn1"), countDistinct(col("o_orderkey")).as("nd1"),
      min(col("o_orderkey").cast("double")).as("mn1"),
      max(col("o_orderkey").cast("double")).as("mx1"),
      count(col("o_custkey")).as("nn2"), countDistinct(col("o_custkey")).as("nd2"),
      min(col("o_custkey").cast("double")).as("mn2"),
      max(col("o_custkey").cast("double")).as("mx2"),
      count(col("o_totalprice")).as("nn3"), countDistinct(col("o_totalprice")).as("nd3"),
      min(col("o_totalprice")).as("mn3"), max(col("o_totalprice")).as("mx3"),
      count(col("o_prio_opt")).as("nn4"), countDistinct(col("o_prio_opt")).as("nd4"))
    stats.select(col("n"), expr(
      """stack(4,
        |  'o_orderkey',  nn1, nd1, mn1, mx1,
        |  'o_custkey',   nn2, nd2, mn2, mx2,
        |  'o_totalprice',nn3, nd3, mn3, mx3,
        |  'o_prio_opt',  nn4, nd4, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
        |AS (col_name, n_nonnull, n_distinct, min_d, max_d)""".stripMargin))
      .orderBy(col("col_name"))
  }

  val q53Sql: String =
    """WITH s AS (
      |  SELECT count(*) AS n,
      |    count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
      |    min(CAST(o_orderkey AS DOUBLE)) AS mn1, max(CAST(o_orderkey AS DOUBLE)) AS mx1,
      |    count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
      |    min(CAST(o_custkey AS DOUBLE)) AS mn2, max(CAST(o_custkey AS DOUBLE)) AS mx2,
      |    count(o_totalprice) AS nn3, count(DISTINCT o_totalprice) AS nd3,
      |    min(o_totalprice) AS mn3, max(o_totalprice) AS mx3,
      |    count(nullif(o_orderpriority, '1-URGENT')) AS nn4,
      |    count(DISTINCT nullif(o_orderpriority, '1-URGENT')) AS nd4
      |  FROM orders)
      |SELECT n, col_name, n_nonnull, n_distinct, min_d, max_d FROM (
      |  SELECT n, 'o_orderkey' AS col_name, nn1 AS n_nonnull, nd1 AS n_distinct, mn1 AS min_d, mx1 AS max_d FROM s
      |  UNION ALL SELECT n, 'o_custkey', nn2, nd2, mn2, mx2 FROM s
      |  UNION ALL SELECT n, 'o_totalprice', nn3, nd3, mn3, mx3 FROM s
      |  UNION ALL SELECT n, 'o_prio_opt', nn4, nd4, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM s)
      |ORDER BY col_name""".stripMargin

  // ---------------------------------------------------------------- q59
  /** TPC-H Q12 shape (priority-split conditional aggregation): per
    * line-status, how many lines belong to critical-priority orders vs
    * the rest, within a ship-date year — the two-bucket CASE-sum pattern
    * every SLA/ops report uses.
    * 100 TB: the date filter prunes at the lineitem scan; the join
    * carries only (orderkey, priority); both CASE sums partial-aggregate
    * map-side into a |statuses|-row result.
    */
  def q59PriorityLines(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_linestatus"))
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1).otherwise(0))
          .cast("long").as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1).otherwise(0))
          .cast("long").as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q59Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q60
  /** TPC-H Q14 shape (promo revenue share): the ratio of two conditional
    * sums over the same joined rows — 100·Σ(promo disc_price)/Σ(disc_price)
    * in a ship month. One pass, no second scan for the denominator.
    * 100 TB: lineitem's month filter prunes at the scan; part is the
    * broadcast dim; both sums fold in ONE partial aggregate (the
    * two-query formulation would scan twice). DECIMAL sums; the final
    * ratio is one double division rounded on both engines.
    */
  def q60PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-06-01") &&
        col("l_shipdate") < lit("1997-07-01"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val p = t(spark, sfDir, "part").select(col("p_partkey"), col("p_type"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(discPrice).cast("double"), 6).as("promo_share"))
  }

  val q60Sql: String =
    s"""SELECT round(100.0 *
      |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
      |             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
      |    CAST(sum($discPriceSql) AS DOUBLE), 6) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= DATE '1997-06-01' AND l_shipdate < DATE '1997-07-01'""".stripMargin

  // ---------------------------------------------------------------- q61
  /** TPC-H Q10 shape (returned-item revenue): customers ranked by the
    * revenue they returned in a quarter — the churn-triage report. A
    * 3-way join (fact + two dims), grouped on the customer attributes,
    * top 20 by revenue.
    * 100 TB: the return-flag + date filters prune lineitem at the scan;
    * customer joins shuffle-hash on custkey; nation broadcasts; the top-20
    * is TakeOrdered, not a global sort.
    */
  def q61ReturnedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .select(col("l_orderkey"), discPrice.as("dp"))
    val o = t(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val n = t(spark, sfDir, "nation").select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("dp")), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q61Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(round(sum($discPriceSql), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q62
  /** TPC-H Q6 shape (forecast revenue change): the pure scan-dominated
    * aggregate — three cheap predicates, one DECIMAL sum, no join at all.
    * The point at 100 TB is the SCAN: all three filters and the 2-column
    * projection push into the parquet reader (PushedFilters on shipdate/
    * discount/quantity min-max prune whole row groups), and the sum is a
    * single map-side partial per file split — one row ever shuffles.
    */
  def q62ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24)
      .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 4)
        .cast("double").as("revenue"))

  val q62Sql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |  CAST(l_discount AS DECIMAL(18,2))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q63
  /** TPC-H Q7 shape (volume shipping between two trade partners): the
    * double-dimension CASE — nation joined TWICE (supplier's and
    * customer's side), the disjunctive pair filter keeping both
    * directions, revenue by (supp_nation, cust_nation, year). Q7 fixes
    * two NATIONS; with ~10 suppliers at sf0.001 a single nation pair is
    * empty, so the pair here is a REGION pair (ASIA-supplied ↔
    * AMERICA-consumed) — identical shape, non-degenerate at every SF.
    * 100 TB: both nation copies broadcast (25 rows); the fact-side joins
    * shuffle on orderkey/custkey; the disjunctive region-pair filter
    * applies before the group-by so only qualifying rows aggregate.
    */
  def q63VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), discPrice.as("dp"))
    val s = t(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val o = t(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(spark, sfDir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n1 = t(spark, sfDir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"),
        col("n_regionkey").as("supp_region"))
    val n2 = t(spark, sfDir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"),
        col("n_regionkey").as("cust_region"))
    li.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_region") === 2 && col("cust_region") === 1) ||
        (col("supp_region") === 1 && col("cust_region") === 2))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(round(sum(col("dp")), 2).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q63Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
      |  CAST(round(sum(dp), 2) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year, $discPriceSql AS dp
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
      |    AND ((n1.n_regionkey = 2 AND n2.n_regionkey = 1)
      |      OR (n1.n_regionkey = 1 AND n2.n_regionkey = 2)))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- q64
  /** TPC-H Q8 shape (national market share): the deepest join tree in the
    * suite — fact + 5 dims + region — ending in a ratio of conditional
    * DECIMAL sums per order-year (share of AMERICA's PROMO-part revenue
    * supplied by NATION_2).
    * 100 TB: part/supplier/nation/region all broadcast; orders and
    * customer shuffle on their keys; numerator and denominator fold in
    * ONE partial aggregate (a two-query formulation would join twice).
    */
  def q64MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), discPrice.as("dp"))
    val p = t(spark, sfDir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val s = t(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n2 = t(spark, sfDir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val o = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val c = t(spark, sfDir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n1 = t(spark, sfDir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))
    val r = t(spark, sfDir, "region").filter(col("r_name") === "AMERICA")
      .select(col("r_regionkey"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_2", col("dp"))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(col("dp")).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q64Sql: String =
    s"""SELECT o_year, round(
      |    CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN dp
      |             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
      |    CAST(sum(dp) AS DOUBLE), 6) AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
      |    $discPriceSql AS dp
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
      |    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01')
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- q65
  /** TPC-H Q9 shape (product-type profit by nation and year). The
    * reference schema has no partsupp table, so the supply cost is the
    * deterministic stand-in 10% · p_retailprice · l_quantity — the SHAPE
    * is Q9's: profit = disc_price − cost over a 5-way join, grouped by
    * supplier nation × order year, part filter as a LIKE on p_name.
    * 100 TB: part (LIKE-filtered), supplier and nation broadcast; only
    * orders shuffles against lineitem; all DECIMAL arithmetic, one
    * partial aggregate.
    */
  def q65ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val p = t(spark, sfDir, "part").filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val s = t(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n = t(spark, sfDir, "nation").select(col("n_nationkey"), col("n_name"))
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val amount = discPrice -
      lit(0.1).cast("decimal(18,2)") * dec(col("p_retailprice")) * dec(col("l_quantity"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(round(sum(amount), 2).cast("double").as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q65Sql: String =
    s"""SELECT n_name, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name, year(o_orderdate) AS o_year,
      |    $discPriceSql - CAST(0.1 AS DECIMAL(18,2)) *
      |      CAST(p_retailprice AS DECIMAL(18,2)) *
      |      CAST(l_quantity AS DECIMAL(18,2)) AS amount
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  WHERE p_name LIKE '%gear%')
      |GROUP BY n_name, o_year
      |ORDER BY n_name, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- q66
  /** TPC-H Q20 shape (part promotion): suppliers who shipped a
    * significant share of a part's 1996 volume — the correlated-aggregate
    * threshold pattern (Q20's availqty > ½·Σqty, re-expressed against
    * lineitem since the schema has no partsupp): keep (supplier, part)
    * pairs whose year total exceeds 30% of the part's total across all
    * suppliers, restrict to 'blue%' parts and ASIA suppliers, list the
    * suppliers.
    * 100 TB: both aggregates partial map-side; the share join is
    * (partkey)-keyed between two already-aggregated (small) sides; part/
    * nation broadcast; DECIMAL quantities keep the threshold exact.
    */
  def q66PartPromotion(spark: SparkSession, sfDir: String): DataFrame = {
    val pq = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("q"))
    val tot = pq.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("q")).as("tq"))
    val p = t(spark, sfDir, "part").filter(col("p_name").like("blue%"))
      .select(col("p_partkey"))
    val s = t(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val n = t(spark, sfDir, "nation").filter(col("n_regionkey") === 2)
      .select(col("n_nationkey"))
    pq.join(tot, col("l_partkey") === col("t_partkey"))
      .filter(col("q") > lit(0.3).cast("decimal(18,2)") * col("tq"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name")).distinct()
      .orderBy(col("s_suppkey"))
  }

  val q66Sql: String =
    """WITH pq AS (
      |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |tot AS (SELECT l_partkey AS t_partkey, sum(q) AS tq FROM pq GROUP BY 1)
      |SELECT DISTINCT s_suppkey, s_name
      |FROM pq
      |JOIN tot ON l_partkey = t_partkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE q > CAST(0.3 AS DECIMAL(18,2)) * tq
      |  AND p_name LIKE 'blue%' AND n_regionkey = 2
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Rank-family window zoo: percent_rank / cume_dist / ntile / nth_value
    * over one per-priority ordering — the distribution-position
    * annotations every feature pipeline stamps on a fact table.
    * The ordering appends the key (o_totalprice, o_orderkey) so every
    * row has a unique rank: rank-based functions are then deterministic
    * and nth_value's running RANGE frame has singleton peer groups on
    * both engines.
    * 100 TB: one shuffle on the partition key, one sort, all four
    * functions evaluate in the same window pass.
    */
  def q67WindowZoo(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).as("quartile"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_lowest"))
      .orderBy(col("o_orderkey"))
  }

  val q67Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  ntile(4) OVER w AS quartile,
      |  nth_value(o_totalprice, 2) OVER w AS second_lowest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q68
  /** MERGE-style upsert (the batch CDC-apply every lakehouse runs): a
    * deterministic changelog — price updates for every 7th key, brand-new
    * rows keyed past the existing range — full-outer-joins the base table
    * and COALESCE picks the changed value; a change_type column tags
    * update/insert/unchanged rows (the MERGE WHEN MATCHED / NOT MATCHED
    * branches).
    * 100 TB: one shuffle join on the merge key. A production MERGE
    * broadcasts the (always comparatively small) changelog and prunes
    * untouched files (copy-on-write) — the join shape here is that plan's
    * shuffle fallback when the changelog is genuinely large.
    */
  def q68UpsertMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("c_key"),
        (dec(col("o_totalprice")) * lit(1.1).cast("decimal(18,2)")).as("c_price"),
        lit("U").as("c_status"))
    val inserts = base.filter(col("o_orderkey") % 1000 === 3)
      .select((col("o_orderkey") + insertOffset(base, "o_orderkey"))
        .as("c_key"),
        dec(col("o_totalprice")).as("c_price"), lit("N").as("c_status"))
    val changes = updates.unionAll(inserts)
    base.join(changes, col("o_orderkey") === col("c_key"), "full_outer")
      .select(
        coalesce(col("o_orderkey"), col("c_key")).as("key"),
        coalesce(col("c_price"), dec(col("o_totalprice"))).cast("double").as("totalprice"),
        coalesce(col("c_status"), col("o_orderstatus")).as("status"),
        when(col("o_orderkey").isNull, "insert")
          .when(col("c_key").isNull, "unchanged").otherwise("update")
          .as("change_type"))
      .orderBy(col("key"))
  }

  val q68Sql: String =
    """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |changes AS (
      |  SELECT o_orderkey AS c_key,
      |    CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(18,2)) AS c_price,
      |    'U' AS c_status
      |  FROM base WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT (CAST(floor(max(o_orderkey)/10000000) AS BIGINT)+1)*10000000 FROM base) AS c_key,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS c_price, 'N' AS c_status
      |  FROM base WHERE o_orderkey % 1000 = 3)
      |SELECT coalesce(o_orderkey, c_key) AS key,
      |  CAST(coalesce(c_price, CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS totalprice,
      |  coalesce(c_status, o_orderstatus) AS status,
      |  CASE WHEN o_orderkey IS NULL THEN 'insert'
      |       WHEN c_key IS NULL THEN 'unchanged' ELSE 'update' END AS change_type
      |FROM base FULL OUTER JOIN changes ON o_orderkey = c_key
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q78
  /** Copy-on-write MERGE with footer-stats file pruning — the PRODUCTION
    * form of q68 (whose scaladoc names this plan; q68 stays as the shuffle
    * fallback for changelogs too large to broadcast). The base table is
    * written once per session KEY-CLUSTERED (range-partitioned on the merge
    * key → non-overlapping per-file footer ranges); the changelog localizes
    * its updates to the bottom fifth of the keyspace (CDC churn is usually
    * range-localized — recent keys update, deep history does not) plus
    * brand-new keys past the whole range. [[Layout.cowMerge]] probes each
    * file's footer min/max against the changelog key set, rewrites ONLY the
    * overlapping files through q68's full-outer COALESCE merge, and leaves
    * every other file byte-identical on disk (ScaleFeaturesSpec asserts
    * untouched files are not rewritten and the result ≡ the all-shuffle
    * merge). Unmatched changelog rows are true inserts BY CONSTRUCTION:
    * every base row's key is inside its file's footer range, so a key
    * overlapping no file exists nowhere in the table.
    * 100 TB: pruning reads footers (manifest-grade metadata, no data I/O);
    * the rewrite scans O(touched bytes); untouched history is never
    * decoded, never shuffled, never rewritten. The returned table is
    * untouched-files ∪ rewritten-files — exactly a COW table format's
    * post-MERGE state.
    */
  /** Scale-adaptive synthetic-insert key offset: the next multiple of
    * 10^7 strictly above the corpus' max key, so merge-fixture inserts
    * CLEAR the keyspace at every scale. At sf ≤ 1 (max key < 10^7) this
    * is exactly the historical 10,000,000 constant — oracle values are
    * bit-identical on the driver corpus — while at sf10+ a constant
    * offset would interleave the inserts with live keys, making the
    * merge touch (and rewrite, unclustered) most of the table: a
    * fixture artifact that read as a pruning regression in the ladder.
    * Every SQL oracle computes the same expression inline.
    */
  private def insertOffset(df: DataFrame, keyCol: String): Long = {
    val mx = df.agg(max(col(keyCol))).head().getLong(0)
    mx / 10000000L * 10000000L + 10000000L
  }

  /** Session+SF-scoped tmp root: pid-tagged so concurrent JVMs never race
    * each other's overwrites — the ONE spelling of the idiom (q78/q82 COW
    * base, q83/q85 snapshot table, q80 IVM state).
    */
  private[graft] def sessionRoot(sfDir: String, tag: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      s"p${ProcessHandle.current().pid()}_$md5"
  }

  /** Serializes the once-per-session base builds: the pid tag isolates
    * JVMs, but q78/q82 (and q83/q85) SHARE a base within one JVM — two
    * threads passing the exists-check together would overwrite each
    * other's in-flight write. The build is rare (once per session+SF), so
    * a coarse monitor costs nothing.
    */
  private val baseBuildLock = new Object

  /** Once-per-session+SF key-clustered write of a COW base table under
    * [[sessionRoot]]; returns (root, baseDir). Shared by q78 (MERGE) and
    * q82 (targeted DELETE) — both COW demos run against the same layout.
    */
  private def cowClusteredBase(spark: SparkSession, sfDir: String, tag: String,
      base: DataFrame): (String, String) = baseBuildLock.synchronized {
    val root = sessionRoot(sfDir, tag)
    val baseDir = s"$root/base"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(baseDir)))
      base.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.mode("overwrite").parquet(baseDir)
    (root, baseDir)
  }

  def q78CowMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val (root, baseDir) = cowClusteredBase(spark, sfDir, "cow", base)
    val outDir = s"$root/merged"
    val cutoff = base.agg(max(col("o_orderkey"))).head().getLong(0) / 5
    val updates = base
      .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") <= cutoff)
      .select(col("o_orderkey").as("c_key"),
        (dec(col("o_totalprice")) * lit(1.1).cast("decimal(18,2)")).as("c_price"),
        lit("U").as("c_status"))
    val inserts = base.filter(col("o_orderkey") % 1000 === 3)
      .select((col("o_orderkey") + insertOffset(base, "o_orderkey"))
        .as("c_key"),
        dec(col("o_totalprice")).as("c_price"), lit("N").as("c_status"))
    val changes = updates.unionAll(inserts)
    // the changelog stays a DATAFRAME end to end (cowMergeKeys): the
    // touched-file set comes from a broadcast range join against the
    // per-file ranges — no O(changelog) driver collect. ALL changelog
    // keys probe the ranges — an insert key overlaps no file, so it
    // prunes nothing extra, and soundness never rests on knowing in
    // advance which keys are inserts
    val stats = Layout.cowMergeKeys(spark, baseDir, "o_orderkey",
      changes.select(col("c_key")),
      touched => touched
        .join(changes, col("o_orderkey") === col("c_key"), "full_outer")
        .select(
          coalesce(col("o_orderkey"), col("c_key")).as("key"),
          coalesce(col("c_price"), dec(col("o_totalprice"))).cast("double").as("totalprice"),
          coalesce(col("c_status"), col("o_orderstatus")).as("status"),
          when(col("o_orderkey").isNull, "insert")
            .when(col("c_key").isNull, "unchanged").otherwise("update")
            .as("change_type")),
      outDir)
    val untouched =
      if (stats.untouched.isEmpty) spark.read.parquet(baseDir).where(lit(false))
      else spark.read.parquet(stats.untouched: _*)
    spark.read.parquet(outDir).unionByName(
      untouched.select(
        col("o_orderkey").as("key"),
        dec(col("o_totalprice")).cast("double").as("totalprice"),
        col("o_orderstatus").as("status"),
        lit("unchanged").as("change_type")))
      .orderBy(col("key"))
  }

  val q78Sql: String =
    """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |cutoff AS (SELECT CAST(floor(max(o_orderkey) / 5) AS BIGINT) AS c FROM orders),
      |changes AS (
      |  SELECT o_orderkey AS c_key,
      |    CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(18,2)) AS c_price,
      |    'U' AS c_status
      |  FROM base WHERE o_orderkey % 7 = 0 AND o_orderkey <= (SELECT c FROM cutoff)
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT (CAST(floor(max(o_orderkey)/10000000) AS BIGINT)+1)*10000000 FROM base) AS c_key,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS c_price, 'N' AS c_status
      |  FROM base WHERE o_orderkey % 1000 = 3)
      |SELECT coalesce(o_orderkey, c_key) AS key,
      |  CAST(coalesce(c_price, CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS totalprice,
      |  coalesce(c_status, o_orderstatus) AS status,
      |  CASE WHEN o_orderkey IS NULL THEN 'insert'
      |       WHEN c_key IS NULL THEN 'unchanged' ELSE 'update' END AS change_type
      |FROM base FULL OUTER JOIN changes ON o_orderkey = c_key
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Targeted copy-on-write DELETE with footer-stats file pruning — the
    * right-to-be-forgotten / retention-purge sibling of q78's MERGE, and
    * the operation privacy law makes every corpus deployment run: a
    * deletion-request key set (here range-localized like real churn: every
    * 13th key in the bottom fifth of the keyspace) probes each file's
    * footer min/max via [[Layout.cowMerge]]; only overlapping files are
    * re-read and rewritten through a broadcast LEFT ANTI join against the
    * request keys, every other file stays BYTE IDENTICAL (deep history
    * never contains the requested keys, so it is never decoded — the spec
    * asserts mtime+length equality). The result is untouched ∪ rewritten:
    * exactly the table a COW format exposes after `DELETE WHERE key IN
    * (...)`.
    * 100 TB: the deletion-request set is the broadcast-small side by
    * nature (requests arrive row-at-a-time, batched daily); pruning reads
    * footers only; rewrite I/O is O(touched bytes). The anti-join (not a
    * NOT IN literal filter) keeps the plan size O(1) in the request count
    * and is the shape that still works when the requests live in their own
    * table.
    */
  def q82TargetedDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    // SHARE q78's clustered base (same layout, distinct outDirs) — two
    // byte-identical copies of orders would be pure wasted I/O
    val (root, baseDir) = cowClusteredBase(spark, sfDir, "cow", base)
    val outDir = s"$root/kept"
    val cutoff = base.agg(max(col("o_orderkey"))).head().getLong(0) / 5
    val requests = base
      .filter(col("o_orderkey") % 13 === 1 && col("o_orderkey") <= cutoff)
      .select(col("o_orderkey").as("d_key"))
      .pin() // probes the file ranges AND feeds the anti-join
    // DataFrame changelog end to end: the request set never collects —
    // touched files resolve via the broadcast range join
    val stats = Layout.cowMergeKeys(spark, baseDir, "o_orderkey", requests,
      touched => touched
        .join(broadcast(requests), col("o_orderkey") === col("d_key"), "left_anti")
        .select(col("o_orderkey").as("key"),
          dec(col("o_totalprice")).cast("double").as("totalprice"),
          col("o_orderstatus").as("status")),
      outDir)
    val untouched =
      if (stats.untouched.isEmpty) spark.read.parquet(baseDir).where(lit(false))
      else spark.read.parquet(stats.untouched: _*)
    spark.read.parquet(outDir).unionByName(
      untouched.select(col("o_orderkey").as("key"),
        dec(col("o_totalprice")).cast("double").as("totalprice"),
        col("o_orderstatus").as("status")))
      .orderBy(col("key"))
  }

  val q82Sql: String =
    """WITH cutoff AS (SELECT CAST(floor(max(o_orderkey) / 5) AS BIGINT) AS c FROM orders)
      |SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
      |  o_orderstatus AS status
      |FROM orders
      |WHERE NOT (o_orderkey % 13 = 1 AND o_orderkey <= (SELECT c FROM cutoff))
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q83
  /** SNAPSHOT TIME TRAVEL — the read side of [[Layout.snapshotAppend]]'s
    * manifest-versioned table (Iceberg/Delta's core idea, built here from
    * first principles): version 1 is the orders table, version 2 appends
    * a delta batch; the query reads BOTH versions through their manifests
    * and emits every row tagged with its version. The equality against a
    * plain-SQL reconstruction certifies the manifest layer end to end:
    * v1's read is unpolluted by the later append (snapshot isolation) and
    * v2's read is exactly old ∪ new (manifest carry-forward). The
    * file-level guarantees — appends never rewrite referenced files,
    * overwrites leave prior versions readable, vacuum deletes only what
    * no kept manifest references — are `ScaleFeaturesSpec`'s half.
    * 100 TB: a version read costs one manifest fetch (O(files) text) +
    * the pinned file scan; no listing of the data directory, no
    * eventual-consistency window; history cost is bounded by vacuum's
    * retention, not by write traffic.
    */
  /** Once-per-session two-version snapshot table (v1 = orders, v2 = v1 +
    * an appended delta) under a pid-tagged root; shared by q83 (time
    * travel) and q85 (change data feed). Returns the root.
    */
  private def snapTable(spark: SparkSession, sfDir: String): String = baseBuildLock.synchronized {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey").as("key"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
    val root = sessionRoot(sfDir, "snap")
    if (Layout.snapshotVersions(spark, root).isEmpty) {
      Layout.snapshotAppend(spark, root, base.repartition(4))
      Layout.snapshotAppend(spark, root, base.filter(col("key") % 500 === 3)
        .select((col("key") + 20000000L).as("key"), col("totalprice")))
    }
    root
  }

  def q83TimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val root = snapTable(spark, sfDir)
    Layout.readSnapshot(spark, root, 1).withColumn("version", lit(1))
      .unionByName(
        Layout.readSnapshot(spark, root, 2).withColumn("version", lit(2)))
      .select(col("version"), col("key"), col("totalprice"))
      .orderBy(col("version"), col("key"))
  }

  val q83Sql: String =
    """WITH base AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |  FROM orders)
      |SELECT 1 AS version, key, totalprice FROM base
      |UNION ALL SELECT 2 AS version, key, totalprice FROM base
      |UNION ALL SELECT 2 AS version, key + 20000000 AS key, totalprice
      |  FROM base WHERE key % 500 = 3
      |ORDER BY version, key""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Snapshot CHANGE DATA FEED — the incremental-consumer read on q83's
    * versioned table: rows in v2 that v1 lacks, via
    * [[Layout.snapshotDiff]]. On append lineage (this table) the delta
    * reads ONLY the files v2 added — `inputFiles` of the returned frame
    * is exactly the v2-minus-v1 file set, zero v1 bytes scanned
    * (`ScaleFeaturesSpec` asserts it) — a metadata-priced diff; across an
    * overwrite the reader falls back to a row-level exceptAll (spec'd
    * correct there too). Downstream, this is what keeps q80's IVM, ST22's
    * refreshing dims, and any derived table INCREMENTAL instead of
    * re-reading the base.
    */
  def q85SnapshotCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val root = snapTable(spark, sfDir)
    Layout.snapshotDiff(spark, root, 1, 2).orderBy(col("key"))
  }

  val q85Sql: String =
    """SELECT o_orderkey + 20000000 AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |FROM orders WHERE o_orderkey % 500 = 3
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q88
  /** MERGE-ON-READ DELETE — the read-side sibling of q82's COW delete and
    * the third member of the snapshot family's write taxonomy (q78 COW
    * MERGE rewrites files, q82 COW DELETE rewrites files,
    * [[Layout.snapshotDeleteMOR]] rewrites NOTHING): the deletion-request
    * keys commit as a footer-pruned (file, key) sidecar in O(requests)
    * with zero data I/O, and [[Layout.readSnapshot]] applies them as a
    * broadcast anti-join over only the scoped files. The table exercises
    * the full lifecycle the oracle must reproduce: v1 key-clustered
    * orders, v2 MOR-deletes q82's churn shape (every 13th key in the
    * bottom fifth), v3 RE-INSERTS a third of the deleted keys at half
    * price — the re-inserted rows SURVIVE because the appended file is
    * outside every sidecar's scope (per-(file,key) scoping = the
    * time-ordered semantics deletion vectors give; an unscoped NOT-IN
    * would wrongly kill them, which is exactly what the oracle equality
    * certifies). `ScaleFeaturesSpec` covers the file-level half: the
    * delete commit adds zero data files and leaves every data file
    * byte-identical, time travel to v1 still shows the deleted keys, and
    * compaction folds the sidecar away without changing the rows.
    * 100 TB: delete latency is O(requests), not O(touched bytes) — the
    * reason every latency-SLA deployment deletes MOR and compacts on a
    * schedule; read-side debt is one broadcast anti-join over dirty
    * files until then.
    */
  private def morTable(spark: SparkSession, sfDir: String): String = baseBuildLock.synchronized {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey").as("key"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
    val root = sessionRoot(sfDir, "mor")
    if (Layout.snapshotVersions(spark, root).isEmpty) {
      // statsKey declares the table's stats column: every later MOR
      // delete scopes from manifest stats, zero footer reads
      Layout.snapshotAppend(spark, root,
        base.repartitionByRange(8, col("key")).sortWithinPartitions(col("key")),
        statsKey = Some("key"))
      val cutoff = base.agg(max(col("key"))).head().getLong(0) / 5
      // DataFrame deletion requests: scoping rides the broadcast range
      // join, no key array ever materializes on the driver
      Layout.snapshotDeleteMORKeys(spark, root, "key", base
        .filter(col("key") % 13 === 1 && col("key") <= cutoff)
        .select(col("key")))
      Layout.snapshotAppend(spark, root, base
        .filter(col("key") % 13 === 1 && col("key") <= cutoff &&
          col("key") % 3 === 0)
        .select(col("key"), (col("totalprice") * 0.5).as("totalprice")))
    }
    root
  }

  def q88MorDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val root = morTable(spark, sfDir)
    Layout.readSnapshot(spark, root).orderBy(col("key"))
  }

  val q88Sql: String =
    """WITH cutoff AS (SELECT CAST(floor(max(o_orderkey) / 5) AS BIGINT) AS c FROM orders)
      |SELECT key, totalprice FROM (
      |  SELECT o_orderkey AS key,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |  FROM orders
      |  WHERE NOT (o_orderkey % 13 = 1 AND o_orderkey <= (SELECT c FROM cutoff))
      |  UNION ALL
      |  SELECT o_orderkey AS key,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) * 0.5 AS totalprice
      |  FROM orders
      |  WHERE o_orderkey % 13 = 1 AND o_orderkey <= (SELECT c FROM cutoff)
      |    AND o_orderkey % 3 = 0)
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q93
  /** MERGE INTO the versioned table — [[Layout.snapshotMerge]]: q78's
    * footer-pruned COW merge published AS A SNAPSHOT COMMIT, the form a
    * production table actually runs (q78 demonstrates the engine on a
    * bare directory; here untouched files are carried BY REFERENCE into
    * the new version's manifest, the rewrite lands in the version's own
    * data directory, the commit is the atomic cutover, and the pre-merge
    * version stays time-travelable — `ScaleFeaturesSpec` asserts the
    * carried files are the same paths byte-identical and the old version
    * still reads exactly). The changelog is q78's shape (range-localized
    * updates at +10%, brand-new inserted keys); the rewrite returns the
    * TABLE schema (a MERGE mutates the table, it does not annotate it).
    * 100 TB: O(touched bytes) rewrite + one manifest write; the merge
    * never blocks readers and never loses history.
    */
  private def smergeTable(spark: SparkSession, sfDir: String): String = baseBuildLock.synchronized {
    val root = sessionRoot(sfDir, "smerge")
    if (Layout.snapshotVersions(spark, root).isEmpty) {
      val base = t(spark, sfDir, "orders")
        .select(col("o_orderkey").as("key"),
          dec(col("o_totalprice")).cast("double").as("totalprice"),
          col("o_orderstatus").as("status"))
      // statsKey: the merge's touched-file pruning reads manifest stats
      Layout.snapshotAppend(spark, root,
        base.repartitionByRange(8, col("key")).sortWithinPartitions(col("key")),
        statsKey = Some("key"))
      val cutoff = base.agg(max(col("key"))).head().getLong(0) / 5
      val changes = base
        .filter(col("key") % 7 === 0 && col("key") <= cutoff)
        .select(col("key").as("c_key"), (col("totalprice") * 1.1).as("c_price"),
          lit("U").as("c_status"))
        .unionAll(base.filter(col("key") % 1000 === 3)
          .select((col("key") + insertOffset(base, "key")).as("c_key"),
            col("totalprice").as("c_price"), lit("N").as("c_status")))
        .pin() // the touched-file probe + rewrite both read it
      // DataFrame changelog interface: touched files resolve via the
      // manifest-stats range join; no key array ever materializes
      Layout.snapshotMergeKeys(spark, root, "key",
        changes.select(col("c_key")),
        touched => touched
          .join(changes, col("key") === col("c_key"), "full_outer")
          .select(coalesce(col("key"), col("c_key")).as("key"),
            coalesce(col("c_price"), col("totalprice")).as("totalprice"),
            coalesce(col("c_status"), col("status")).as("status")))
    }
    root
  }

  def q93SnapshotMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val root = smergeTable(spark, sfDir)
    Layout.readSnapshot(spark, root).orderBy(col("key"))
  }

  val q93Sql: String =
    """WITH base AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
      |  o_orderstatus AS status FROM orders),
      |cutoff AS (SELECT CAST(floor(max(key) / 5) AS BIGINT) AS c FROM base),
      |changes AS (
      |  SELECT key AS c_key, totalprice * 1.1 AS c_price, 'U' AS c_status
      |  FROM base WHERE key % 7 = 0 AND key <= (SELECT c FROM cutoff)
      |  UNION ALL
      |  SELECT key + (SELECT (CAST(floor(max(key)/10000000) AS BIGINT)+1)*10000000 FROM base) AS c_key, totalprice AS c_price, 'N' AS c_status
      |  FROM base WHERE key % 1000 = 3)
      |SELECT coalesce(key, c_key) AS key,
      |  coalesce(c_price, totalprice) AS totalprice,
      |  coalesce(c_status, status) AS status
      |FROM base FULL OUTER JOIN changes ON key = c_key
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q94
  /** PARTITIONED SNAPSHOT TABLE with manifest partition pruning — the
    * read every date/status-partitioned corpus runs daily: the table is
    * committed via [[Layout.snapshotAppendPartitioned]] (per-file
    * partition-value sets recorded in the manifest at commit), and a
    * partition read ([[Layout.readSnapshot]]'s `partitions` filter)
    * OPENS only files whose recorded value set intersects the request —
    * `inputFiles` excludes every out-of-partition file, which
    * `ScaleFeaturesSpec` asserts. The oracle equality certifies the
    * semantics: partition-pruned read ≡ plain filtered read of the whole
    * table. The partition column stays in the data (no directory
    * encoding), so the same files serve unpartitioned readers unchanged.
    * 100 TB: a one-partition query on a 1000-partition corpus plans
    * O(manifest) metadata and scans ~0.1% of the bytes — without
    * per-file partition values it would read every footer just to
    * discover the other 99.9% are irrelevant.
    */
  private def partTable(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val root = sessionRoot(sfDir, "part")
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        val base = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("totalprice"),
            col("o_orderstatus").as("status"))
        Layout.snapshotAppendPartitioned(spark, root, base, "status",
          statsKey = Some("key"))
      }
      root
    }

  def q94PartitionPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val root = partTable(spark, sfDir)
    Layout.readSnapshot(spark, root, partitions = Seq("F"))
      .orderBy(col("key"))
  }

  val q94Sql: String =
    """SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
      |  o_orderstatus AS status
      |FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q95
  /** POINT LOOKUP on the versioned table through the CDF-MAINTAINED
    * BLOOM INDEX — the read a serving/debug path runs against a
    * petabyte corpus ("fetch these 42 records"): the base is
    * HASH-layouted (worst case for min/max pruning — every file's key
    * range spans the keyspace), [[Layout.maintainBloomIndex]] keeps one
    * 16 KiB bloom per data file as an incrementally-maintained snapshot
    * table, and [[Layout.snapshotPointLookup]] reads only bloom-hit
    * files then semi-joins the probe set. No false negatives ⇒ the
    * result is EXACTLY the IN-filter (this oracle); the spec half
    * (ManifestV2Spec) covers pruning counts, incremental maintenance,
    * MOR composition, and streaming exactly-once.
    * 100 TB: O(hits + FPP·files) file reads instead of a full scan —
    * the difference between milliseconds and a cluster-hour per fetch.
    */
  private val lookupKeys: Seq[Long] = 1L to 4000L by 97L

  private def slookTable(spark: SparkSession, sfDir: String): (String, String) =
    baseBuildLock.synchronized {
      val root = sessionRoot(sfDir, "slook")
      val idx = sessionRoot(sfDir, "slookidx")
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        val base = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("totalprice"))
          .repartition(8, col("key") % 8)
        Layout.snapshotAppend(spark, root, base)
        Layout.maintainBloomIndex(spark, root, idx, "key")
      }
      (root, idx)
    }

  def q95SnapshotLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val (root, idx) = slookTable(spark, sfDir)
    Layout.snapshotPointLookup(spark, root, idx, "key", lookupKeys)
      .result.orderBy(col("key"))
  }

  val q95Sql: String =
    s"""SELECT o_orderkey AS key,
       |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
       |FROM orders WHERE o_orderkey IN (${lookupKeys.mkString(", ")})
       |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q96
  /** KEY-RANGE PRUNED SNAPSHOT READ — the everyday query on a
    * key/time-clustered versioned corpus ("last week's rows"):
    * [[Layout.readSnapshotRange]] keeps only files whose MANIFEST STATS
    * range intersects the request (the q93/q88 table is key-clustered
    * with `statsKey`, so ranges tile disjointly and a narrow range
    * opens O(overlapping) files — from metadata, zero footer I/O) and
    * row-filters, so the result is exactly the BETWEEN filter (this
    * oracle). Reuses q93's post-merge table: the range read composes
    * with carried-by-reference files and rewritten files alike.
    * 100 TB: a day's slice of a year-clustered corpus plans from the
    * manifest and scans ~0.3% of the bytes.
    */
  def q96RangeRead(spark: SparkSession, sfDir: String): DataFrame = {
    val root = smergeTable(spark, sfDir) // key-clustered, statsKey=key
    val hi = Layout.readSnapshot(spark, root, 1)
      .agg(max(col("key"))).head().getLong(0) / 4
    Layout.readSnapshotRange(spark, root, "key", 10L, hi)
      .orderBy(col("key"))
  }

  // ---------------------------------------------------------------- q97
  /** THE VERSIONED TABLE AS A CATALYST RELATION — q96's range read with
    * NO special read API: [[Layout.snapshotTable]] exposes the snapshot
    * as a `HadoopFsRelation` over [[graft.sources.SnapshotFileIndex]],
    * and an ordinary `.filter(key BETWEEN ...)` is pushed by Catalyst
    * into MANIFEST-STATS file pruning at physical planning (the
    * Delta/Iceberg integration shape — the optimizer decides, the
    * manifest answers; ManifestV2Spec asserts the pruned listing for
    * BETWEEN/IN/partition/conjunction shapes and conservative fallback).
    * Same oracle as q96: the two paths must agree with the plain SQL —
    * certifying that API-side pruning and Catalyst-side pruning
    * implement the same table.
    */
  def q97CatalystTable(spark: SparkSession, sfDir: String): DataFrame = {
    val root = smergeTable(spark, sfDir)
    val hi = Layout.readSnapshot(spark, root, 1)
      .agg(max(col("key"))).head().getLong(0) / 4
    Layout.snapshotTable(spark, root)
      .filter(col("key") >= 10L && col("key") <= hi)
      .orderBy(col("key"))
  }

  // ---------------------------------------------------------------- q98
  /** THE SQL SURFACE END TO END — q93's merge story driven ENTIRELY
    * through SQL over the DSv2 catalog ([[graft.sources.GraftCatalog]]):
    * `CREATE TABLE` (statsKey property) → `INSERT INTO` (snapshot
    * commit of the key-clustered base) → `MERGE INTO` (rewritten by
    * [[graft.plans.GraftMergeRule]] into the manifest-stats-pruned COW
    * merge — O(touched + source), untouched files carried by
    * reference) → a pure-SQL `SELECT … WHERE key BETWEEN` through
    * Spark's own vectorized DSv2 parquet scan. Same oracle as q96/q97:
    * the Scala API, the Catalyst relation, and the SQL catalog must
    * all describe the same table.
    * 100 TB: identical plans to q93+q96 — the SQL layer adds one
    * manifest resolve at `loadTable`, nothing per-row.
    */
  private def sqlCatTable(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val wh = sessionRoot(sfDir, "sqlcat")
      val root = s"$wh/q98t"
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        spark.conf.set("spark.sql.catalog.graft_sql",
          classOf[graft.sources.GraftCatalog].getName)
        spark.conf.set("spark.sql.catalog.graft_sql.root", wh)
        val base = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("totalprice"),
            col("o_orderstatus").as("status"))
        base.repartitionByRange(8, col("key"))
          .sortWithinPartitions(col("key"))
          .createOrReplaceTempView("q98_base")
        val cutoff = base.agg(max(col("key"))).head().getLong(0) / 5
        base.filter(col("key") % 7 === 0 && col("key") <= cutoff)
          .select(col("key").as("c_key"),
            (col("totalprice") * 1.1).as("c_price"), lit("U").as("c_status"))
          .unionAll(base.filter(col("key") % 1000 === 3)
            .select((col("key") + insertOffset(base, "key")).as("c_key"),
              col("totalprice").as("c_price"), lit("N").as("c_status")))
          .pin() // the merge probes + rewrites read it twice
          .createOrReplaceTempView("q98_changes")
        spark.sql("CREATE TABLE graft_sql.q98t " +
          "(key BIGINT, totalprice DOUBLE, status STRING) " +
          "TBLPROPERTIES ('statsKey'='key')")
        spark.sql("INSERT INTO graft_sql.q98t SELECT * FROM q98_base")
        spark.sql(
          """MERGE INTO graft_sql.q98t t USING q98_changes s
            |ON t.key = s.c_key
            |WHEN MATCHED THEN
            |  UPDATE SET totalprice = s.c_price, status = s.c_status
            |WHEN NOT MATCHED THEN
            |  INSERT (key, totalprice, status)
            |  VALUES (s.c_key, s.c_price, s.c_status)""".stripMargin)
      }
      root
    }

  def q98SqlTable(spark: SparkSession, sfDir: String): DataFrame = {
    val root = sqlCatTable(spark, sfDir)
    val hi = Layout.readSnapshot(spark, root, 2) // v2 = the base INSERT
      .agg(max(col("key"))).head().getLong(0) / 4
    spark.sql("SELECT key, totalprice, status FROM graft_sql.q98t " +
      s"WHERE key >= 10 AND key <= $hi ORDER BY key")
  }

  // ---------------------------------------------------------------- q99
  /** TEMPORAL-PRUNED SNAPSHOT READ — q96's everyday query in its most
    * common production spelling: the corpus is clustered and
    * stats-keyed on its EVENT-TIME column (`o_orderdate`, written as
    * parquet TIMESTAMP_MICROS so footer stats are exact micros — see
    * the manifest-v2 temporal stats), and the query slices one calendar
    * year through [[Layout.snapshotTable]]. The filter reaches
    * [[graft.sources.SnapshotFileIndex]] as micros-literal bounds and
    * prunes to the O(overlapping) files from manifest metadata alone.
    * 100 TB: "last month over a years-deep time-clustered corpus" —
    * THE dominant scan shape of every telemetry/training-log table;
    * with temporal stats it plans from the manifest instead of
    * footer-probing a million files.
    */
  private def timeTable(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val root = sessionRoot(sfDir, "timetab") + "/q99t"
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        val prevOtt = spark.conf.getOption(
          "spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType",
          "TIMESTAMP_MICROS")
        try {
          val base = t(spark, sfDir, "orders")
            .select(col("o_orderkey").as("key"),
              col("o_orderdate").as("odate"),
              dec(col("o_totalprice")).cast("double").as("price"))
            .repartitionByRange(8, col("odate"))
            .sortWithinPartitions(col("odate"))
          Layout.snapshotAppend(spark, root, base, statsKey = Some("odate"))
        } finally prevOtt match {
          case Some(v) =>
            spark.conf.set("spark.sql.parquet.outputTimestampType", v)
          case None =>
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        }
      }
      root
    }

  def q99TimeSlice(spark: SparkSession, sfDir: String): DataFrame = {
    val root = timeTable(spark, sfDir)
    Layout.snapshotTable(spark, root)
      .filter(col("odate") >= lit("1996-01-01").cast("timestamp") &&
        col("odate") < lit("1997-01-01").cast("timestamp"))
      .orderBy(col("key"))
  }

  // ---------------------------------------------------------------- q100
  /** DPP STAR JOIN THROUGH THE SQL CATALOG — the dominant warehouse
    * query shape at 100 TB (fact ⋈ small dim, dim-side selective
    * predicate), driven end-to-end over two graft snapshot tables: the
    * fact is PARTITIONED on the join key (`partCol='flag'` — each file's
    * flag set in the manifest), and [[graft.sources.GraftScan]]'s
    * `SupportsRuntimeFiltering` lets Spark's dynamic partition pruning
    * deliver the dim's surviving keys as a runtime `IN` filter that
    * RE-prunes the fact's file list at execution — the fact reads
    * O(matching partition's files), not O(table), with no static
    * predicate on it at all. `SqlScanPruningSpec` pins the file-count
    * evidence; this query pins the row-level answer against the oracle.
    */
  private def dppTables(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val wh = sessionRoot(sfDir, "dppcat")
      spark.conf.set("spark.sql.catalog.graft_dpp",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_dpp.root", wh)
      val factRoot = s"$wh/q100f"
      if (Layout.snapshotVersions(spark, factRoot).isEmpty) {
        val fact = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("price"),
            col("o_orderstatus").as("flag"))
        Layout.snapshotAppendPartitioned(spark, factRoot, fact, "flag")
        val dim = fact.select(col("flag")).distinct()
          .withColumn("keep",
            when(col("flag") === "F", lit("yes")).otherwise(lit("no")))
        Layout.snapshotAppend(spark, s"$wh/q100d", dim)
      }
      wh
    }

  def q100DppJoin(spark: SparkSession, sfDir: String): DataFrame = {
    dppTables(spark, sfDir)
    spark.sql(
      """SELECT f.key, f.price, f.flag FROM graft_dpp.q100f f
        |JOIN graft_dpp.q100d d ON f.flag = d.flag
        |WHERE d.keep = 'yes'
        |ORDER BY f.key""".stripMargin)
  }

  val q100Sql: String =
    """WITH fact AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  o_orderstatus AS flag FROM orders),
      |dim AS (SELECT DISTINCT flag,
      |  CASE WHEN flag = 'F' THEN 'yes' ELSE 'no' END AS keep FROM fact)
      |SELECT f.key, f.price, f.flag FROM fact f
      |JOIN dim d ON f.flag = d.flag
      |WHERE d.keep = 'yes'
      |ORDER BY f.key""".stripMargin

  // ---------------------------------------------------------------- q101
  /** COLUMN MAPPING ON THE ORACLE GATE — a table whose column was
    * RENAMED by a metadata-only commit ([[Layout.snapshotRenameColumn]])
    * must answer a pure-SQL read under the NEW name with the OLD files'
    * bytes: the logical->physical alias crosses the whole stack (DSv2
    * scan schema mapping, filter physicalization for row-group pushdown,
    * post-rename appends writing the original physical slot). The oracle
    * just aliases in SQL — the two must agree row-for-row.
    */
  private def renameTable(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val wh = sessionRoot(sfDir, "renamecat")
      spark.conf.set("spark.sql.catalog.graft_ren",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_ren.root", wh)
      val root = s"$wh/q101t"
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        val base = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            col("o_orderstatus").as("status"),
            dec(col("o_totalprice")).cast("double").as("price"))
        val cutoff = base.agg(max(col("key"))).head().getLong(0) / 2
        // two appends AROUND the rename: files under BOTH physical eras
        Layout.snapshotAppend(spark, root,
          base.filter(col("key") <= cutoff), statsKey = Some("key"))
        Layout.snapshotRenameColumn(spark, root, "status", "state")
        Layout.snapshotAppend(spark, root,
          base.filter(col("key") > cutoff)
            .withColumnRenamed("status", "state"))
      }
      root
    }

  def q101RenameRead(spark: SparkSession, sfDir: String): DataFrame = {
    renameTable(spark, sfDir)
    spark.sql(
      """SELECT key, state, price FROM graft_ren.q101t
        |WHERE state <> 'P'
        |ORDER BY key""".stripMargin)
  }

  val q101Sql: String =
    """SELECT o_orderkey AS key, o_orderstatus AS state,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM orders
      |WHERE o_orderstatus <> 'P'
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q102
  /** PARTITION-SCOPED OVERWRITE ON THE ORACLE GATE — the daily-reload
    * shape (`INSERT OVERWRITE … PARTITION`, Delta's replaceWhere) driven
    * end-to-end through SQL: a fact table partitioned on `flag` loads
    * all of `orders`, then the 'F' partition is atomically REPLACED with
    * its recomputed content (prices marked up 10%) — every other
    * partition's files carried by reference
    * ([[Layout.snapshotOverwritePartitions]]). The oracle recomputes the
    * same final state in plain SQL (CASE on the partition). Certifies
    * replace-exactness row-for-row: nothing lost outside the scope,
    * nothing stale inside it.
    * 100 TB: "reload yesterday's partition" costs one partition's I/O —
    * untouched history never rewrites.
    */
  private def partOvwTable(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val wh = sessionRoot(sfDir, "povwcat")
      spark.conf.set("spark.sql.catalog.graft_po",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_po.root", wh)
      val root = s"$wh/q102t"
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        spark.sql("CREATE TABLE graft_po.q102t " +
          "(key BIGINT, price DOUBLE, flag STRING) PARTITIONED BY (flag)")
        t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("price"),
            col("o_orderstatus").as("flag"))
          .createOrReplaceTempView("q102_src")
        spark.sql("INSERT INTO graft_po.q102t SELECT * FROM q102_src")
        spark.sql(
          """INSERT OVERWRITE graft_po.q102t PARTITION (flag = 'F')
            |SELECT key, price * 1.1 AS price FROM q102_src
            |WHERE flag = 'F'""".stripMargin)
      }
      root
    }

  def q102PartitionOverwrite(spark: SparkSession, sfDir: String): DataFrame = {
    partOvwTable(spark, sfDir)
    spark.sql(
      "SELECT key, price, flag FROM graft_po.q102t ORDER BY key, flag")
  }

  val q102Sql: String =
    """SELECT o_orderkey AS key,
      |  CASE WHEN o_orderstatus = 'F'
      |    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) * 1.1
      |    ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) END
      |    AS price,
      |  o_orderstatus AS flag
      |FROM orders
      |ORDER BY key, flag""".stripMargin

  // ---------------------------------------------------------------- q103
  /** MULTI-CLAUSE CONDITIONAL MERGE ON THE ORACLE GATE — the full
    * Delta-style clause matrix ([[graft.plans.GraftMergeRule]]) driven
    * through SQL in one statement: three WHEN MATCHED clauses
    * (conditional DELETE, conditional UPDATE, unconditional UPDATE —
    * first wins), two WHEN NOT MATCHED INSERT clauses (conditional +
    * fallback), and two WHEN NOT MATCHED BY SOURCE clauses (conditional
    * DELETE + conditional UPDATE). The oracle replays the same
    * semantics as a FULL OUTER JOIN + first-match CASE ladder in plain
    * SQL — row-for-row equality certifies clause ORDERING, null-safe
    * condition evaluation, and the NMBS full-width changelog path.
    * 100 TB: without NMBS clauses the rewrite prunes to source-key-
    * overlapping files; with them every populated file rewrites (the
    * same price Delta pays — no file-level stat bounds "keys ABSENT
    * from the source").
    */
  private def mergeTable(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val wh = sessionRoot(sfDir, "mrgcat")
      spark.conf.set("spark.sql.catalog.graft_mrg",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_mrg.root", wh)
      val root = s"$wh/q103t"
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        spark.sql("CREATE TABLE graft_mrg.q103t " +
          "(key BIGINT, price DOUBLE, status STRING) " +
          "TBLPROPERTIES ('statsKey' = 'key')")
        val base = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("price"),
            col("o_orderstatus").as("status"))
        base.createOrReplaceTempView("q103_base")
        spark.sql("INSERT INTO graft_mrg.q103t SELECT * FROM q103_base")
        spark.sql(
          """SELECT key AS k, price * 1.1 AS sprice, 'U' AS tag
            |FROM q103_base WHERE key % 7 = 0
            |UNION ALL
            |SELECT key + (SELECT (CAST(floor(max(key)/10000000) AS BIGINT)+1)*10000000
            |  FROM q103_base) AS k, price AS sprice,
            |  CASE WHEN key % 2000 = 3 THEN 'N' ELSE 'O' END AS tag
            |FROM q103_base WHERE key % 1000 = 3""".stripMargin)
          .createOrReplaceTempView("q103_src")
        spark.sql(
          """MERGE INTO graft_mrg.q103t t USING q103_src s ON t.key = s.k
            |WHEN MATCHED AND s.tag = 'U' AND t.key % 21 = 0 THEN DELETE
            |WHEN MATCHED AND t.key % 14 = 0 THEN
            |  UPDATE SET price = s.sprice * 2, status = 'D2'
            |WHEN MATCHED THEN UPDATE SET price = s.sprice, status = 'U1'
            |WHEN NOT MATCHED AND s.tag = 'N' THEN
            |  INSERT (key, price, status) VALUES (s.k, s.sprice, 'IN')
            |WHEN NOT MATCHED THEN
            |  INSERT (key, price, status) VALUES (s.k, s.sprice + 1, 'IO')
            |WHEN NOT MATCHED BY SOURCE AND t.key % 11 = 0 THEN DELETE
            |WHEN NOT MATCHED BY SOURCE AND t.key % 13 = 0 THEN
            |  UPDATE SET status = 'NX'""".stripMargin)
      }
      root
    }

  def q103MultiClauseMerge(spark: SparkSession, sfDir: String): DataFrame = {
    mergeTable(spark, sfDir)
    spark.sql(
      "SELECT key, price, status FROM graft_mrg.q103t ORDER BY key")
  }

  val q103Sql: String =
    """WITH base AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  o_orderstatus AS status FROM orders),
      |src AS (
      |  SELECT key AS k, price * 1.1 AS sprice, 'U' AS tag
      |  FROM base WHERE key % 7 = 0
      |  UNION ALL
      |  SELECT key + (SELECT (CAST(floor(max(key)/10000000) AS BIGINT)+1)*10000000 FROM base) AS k, price AS sprice,
      |    CASE WHEN key % 2000 = 3 THEN 'N' ELSE 'O' END AS tag
      |  FROM base WHERE key % 1000 = 3),
      |joined AS (SELECT t.key AS tkey, t.price AS tprice,
      |    t.status AS tstatus, s.k, s.sprice, s.tag
      |  FROM base t FULL OUTER JOIN src s ON t.key = s.k),
      |merged AS (
      |  SELECT
      |    CASE WHEN tkey IS NOT NULL THEN tkey ELSE k END AS key,
      |    CASE
      |      WHEN tkey IS NOT NULL AND k IS NOT NULL THEN
      |        CASE WHEN tkey % 14 = 0 THEN sprice * 2 ELSE sprice END
      |      WHEN tkey IS NOT NULL THEN tprice
      |      ELSE CASE WHEN tag = 'N' THEN sprice ELSE sprice + 1 END
      |    END AS price,
      |    CASE
      |      WHEN tkey IS NOT NULL AND k IS NOT NULL THEN
      |        CASE WHEN tkey % 14 = 0 THEN 'D2' ELSE 'U1' END
      |      WHEN tkey IS NOT NULL THEN
      |        CASE WHEN tkey % 13 = 0 THEN 'NX' ELSE tstatus END
      |      ELSE CASE WHEN tag = 'N' THEN 'IN' ELSE 'IO' END
      |    END AS status,
      |    CASE
      |      WHEN tkey IS NOT NULL AND k IS NOT NULL THEN
      |        (tag = 'U' AND tkey % 21 = 0)
      |      WHEN tkey IS NOT NULL THEN tkey % 11 = 0
      |      ELSE FALSE
      |    END AS deleted
      |  FROM joined)
      |SELECT key, price, status FROM merged WHERE NOT deleted
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q104
  /** TEMPORAL-TRANSFORM STAR JOIN ON THE ORACLE GATE — q100's DPP shape
    * over a `days(odate)` TRANSFORM-partitioned fact
    * ([[graft.ops.PartSpec]], `PARTITIONED BY (days(odate))`): the fact
    * records each file's epoch-day set in the manifest; the date-dim's
    * selective predicate survives to runtime, and the DPP-delivered
    * `IN` filter on the raw TIMESTAMP join column maps through the
    * days() transform to re-prune the fact's file list — the "join
    * facts to a date dimension, keep one year" query every telemetry
    * warehouse runs, now pruning from transformed partition metadata
    * with no static predicate on the fact at all.
    * `PartitionTransformSpec` pins the file-count evidence; this row
    * pins the row-level answer against the oracle.
    */
  private def transformStarTables(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val wh = sessionRoot(sfDir, "ptstar")
      spark.conf.set("spark.sql.catalog.graft_pts",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_pts.root", wh)
      val factRoot = s"$wh/q104f"
      if (Layout.snapshotVersions(spark, factRoot).isEmpty) {
        val prevOtt = spark.conf.getOption(
          "spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType",
          "TIMESTAMP_MICROS")
        try {
          val fact = t(spark, sfDir, "orders")
            .select(col("o_orderkey").as("key"),
              dec(col("o_totalprice")).cast("double").as("price"),
              col("o_orderdate").as("odate"))
          // RANGE-cluster on the event time before the append: a hash
          // shuffle by day scatters every year across every file (each
          // file records ~all days → transform pruning keeps all);
          // contiguous day ranges per file are the layout a temporal
          // table actually ships with, and what lets the dim's
          // year-1996 filter prune files both statically and via DPP —
          // visible in §5.4's planned-file counts at sf1
          Layout.snapshotAppendSpec(spark, factRoot,
            fact.repartitionByRange(8, col("odate"))
              .sortWithinPartitions(col("odate")),
            "days(odate)", shuffleByPartition = false)
          val dim = fact.select(col("odate")).distinct()
            .withColumn("keep",
              when(year(col("odate")) === 1996, lit("yes"))
                .otherwise(lit("no")))
          Layout.snapshotAppend(spark, s"$wh/q104d", dim)
        } finally prevOtt match {
          case Some(v) =>
            spark.conf.set("spark.sql.parquet.outputTimestampType", v)
          case None =>
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        }
      }
      wh
    }

  def q104TransformStarJoin(spark: SparkSession, sfDir: String): DataFrame = {
    transformStarTables(spark, sfDir)
    spark.sql(
      """SELECT f.key, f.price FROM graft_pts.q104f f
        |JOIN graft_pts.q104d d ON f.odate = d.odate
        |WHERE d.keep = 'yes'
        |ORDER BY f.key""".stripMargin)
  }

  val q104Sql: String =
    """WITH fact AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  o_orderdate AS odate FROM orders),
      |dim AS (SELECT DISTINCT odate,
      |  CASE WHEN EXTRACT(year FROM odate) = 1996 THEN 'yes' ELSE 'no'
      |  END AS keep FROM fact)
      |SELECT f.key, f.price FROM fact f
      |JOIN dim d ON f.odate = d.odate
      |WHERE d.keep = 'yes'
      |ORDER BY f.key""".stripMargin

  // ---------------------------------------------------------------- q105
  /** BUCKETED STORAGE-PARTITIONED JOIN ON THE ORACLE GATE — two tables
    * declared `PARTITIONED BY (bucket(8, key))`
    * ([[graft.ops.PartSpec]]) joined on the bucket column with Spark's
    * SPJ switch on: the scans report
    * `KeyGroupedPartitioning(bucket(8, key))`, the transform resolves
    * through [[graft.sources.GraftCatalog]]'s function catalog, and
    * when every planned file is single-bucket the join runs with ZERO
    * exchanges (`StoragePartitionedJoinSpec` pins that plan shape; this
    * row pins the row-level answer against a plain-SQL join oracle —
    * and stays correct either way, since impure layouts fall back to
    * the shuffled plan). 100 TB: the bucketed fact-fact join is THE
    * join shape hash layouts exist for.
    */
  private def bucketJoinTables(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val wh = sessionRoot(sfDir, "bktcat")
      spark.conf.set("spark.sql.catalog.graft_bkt",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_bkt.root", wh)
      // completion guard on BOTH tables' full version counts: a crash
      // mid-build must trigger a clean rebuild, never a silent partial
      // corpus persisting across runs
      def complete(t: String) =
        Layout.snapshotVersions(spark, s"$wh/$t").size >= 8
      if (!complete("q105a") || !complete("q105b")) {
        for (t <- Seq("q105a", "q105b")) {
          val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        // one materialization serves all 16 per-bucket appends (each
        // append otherwise re-scans and re-derives the projection)
        val base = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("price"))
          .pin()
        // one append per bucket → single-bucket files, the layout SPJ
        // keys off (a plain multi-bucket append would only cost the
        // fallback shuffle, never correctness)
        // 8 buckets (16 appends): the fixture build dominates the
        // query's sweep cost — half the appends, same plan shape (the
        // SPJ spec pins zero-exchange plans on its own fixtures; this
        // row pins the row-level answer). The two tables build in
        // parallel threads: commits to DIFFERENT tables never contend,
        // while each table's own appends stay sequential (clean
        // version claims, no retry churn).
        def inB(b: Int) = pmod(xxhash64(col("key")), lit(8)) === b
        val builders = Seq(
          () => for (b <- 0 until 8)
            Layout.snapshotAppendSpec(spark, s"$wh/q105a",
              base.filter(inB(b)).coalesce(1), "bucket(8,key)",
              shuffleByPartition = false),
          () => for (b <- 0 until 8)
            Layout.snapshotAppendSpec(spark, s"$wh/q105b",
              base.filter(col("key") % 3 === 0)
                .select(col("key"), (col("key") % 7).as("qty"))
                .filter(inB(b)).coalesce(1), "bucket(8,key)",
              shuffleByPartition = false))
        // a builder failure must propagate, not leave a silent partial
        // corpus this call then serves (the completion guard only
        // protects the NEXT call)
        val failure = new java.util.concurrent.atomic
          .AtomicReference[Throwable]()
        val threads = builders.map(f => new Thread(() =>
          try f() catch { case t: Throwable =>
            failure.compareAndSet(null, t) }))
        threads.foreach(_.start())
        threads.foreach(_.join())
        if (failure.get() != null) throw failure.get()
      }
      wh
    }

  def q105BucketJoin(spark: SparkSession, sfDir: String): DataFrame = {
    bucketJoinTables(spark, sfDir)
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = spark.sql(
        """SELECT a.key, a.price, b.qty FROM graft_bkt.q105a a
          |JOIN graft_bkt.q105b b ON a.key = b.key
          |ORDER BY a.key""".stripMargin)
      // Force PHYSICAL planning while the SPJ conf is on:
      // `QueryExecution.executedPlan` is a cached lazy val, so the
      // caller's own materialization (the driver hashes this frame
      // exactly once) runs the zero-exchange storage-partitioned plan
      // — no double execution, and the session conf is restored below
      // so the switch never leaks into unrelated queries.
      df.queryExecution.executedPlan
      df
    } finally saved match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None =>
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  val q105Sql: String =
    """WITH a AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |  FROM orders),
      |b AS (SELECT key, key % 7 AS qty FROM a WHERE key % 3 = 0)
      |SELECT a.key, a.price, b.qty FROM a
      |JOIN b ON a.key = b.key
      |ORDER BY a.key""".stripMargin

  val q96Sql: String =
    """WITH base AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
      |  o_orderstatus AS status FROM orders),
      |cutoff AS (SELECT CAST(floor(max(key) / 5) AS BIGINT) AS c FROM base),
      |hi AS (SELECT CAST(floor(max(key) / 4) AS BIGINT) AS h FROM base),
      |changes AS (
      |  SELECT key AS c_key, totalprice * 1.1 AS c_price, 'U' AS c_status
      |  FROM base WHERE key % 7 = 0 AND key <= (SELECT c FROM cutoff)
      |  UNION ALL
      |  SELECT key + (SELECT (CAST(floor(max(key)/10000000) AS BIGINT)+1)*10000000 FROM base) AS c_key, totalprice AS c_price, 'N' AS c_status
      |  FROM base WHERE key % 1000 = 3),
      |merged AS (
      |  SELECT coalesce(key, c_key) AS key,
      |    coalesce(c_price, totalprice) AS totalprice,
      |    coalesce(c_status, status) AS status
      |  FROM base FULL OUTER JOIN changes ON key = c_key)
      |SELECT key, totalprice, status FROM merged
      |WHERE key >= 10 AND key <= (SELECT h FROM hi)
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q92
  /** SNAPSHOT SCHEMA EVOLUTION — additive column evolution on the
    * versioned table (the ALTER TABLE ADD COLUMN every long-lived
    * deployment performs without rewriting history): v2 appends rows
    * carrying a NEW `channel` column; `readSnapshot` unions file schemas
    * (one footer per file — manifest-grade), so pre-evolution rows read
    * the added column as NULL and post-evolution rows carry their
    * values — while TIME TRAVEL to v1 still shows the original narrow
    * schema (spec'd: the old version's contract is immutable, columns
    * included). Drops/renames are overwrite-class operations by design;
    * type conflicts fail loudly at the parquet merge.
    * 100 TB: evolution costs zero data I/O — no backfill rewrite of
    * petabytes of history, the whole point of additive evolution.
    */
  private def evoTable(spark: SparkSession, sfDir: String): String = baseBuildLock.synchronized {
    val root = sessionRoot(sfDir, "evo")
    if (Layout.snapshotVersions(spark, root).isEmpty) {
      val base = t(spark, sfDir, "orders")
        .select(col("o_orderkey").as("key"),
          dec(col("o_totalprice")).cast("double").as("totalprice"))
      Layout.snapshotAppend(spark, root, base.repartition(4))
      Layout.snapshotAppend(spark, root, base.filter(col("key") % 400 === 7)
        .select((col("key") + 50000000L).as("key"), col("totalprice"),
          concat(lit("ch"), (col("key") % 3).cast("string")).as("channel")))
    }
    root
  }

  def q92SchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val root = evoTable(spark, sfDir)
    Layout.readSnapshot(spark, root)
      .select(col("key"), col("totalprice"), col("channel"))
      .orderBy(col("key"))
  }

  val q92Sql: String =
    """WITH base AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |  FROM orders)
      |SELECT key, totalprice, CAST(NULL AS VARCHAR) AS channel FROM base
      |UNION ALL
      |SELECT key + 50000000 AS key, totalprice,
      |  'ch' || CAST(key % 3 AS VARCHAR) AS channel
      |FROM base WHERE key % 400 = 7
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q91
  /** BLOOM-INDEXED POINT LOOKUP — the file-skipping case footer min/max
    * CANNOT serve: the base table is written HASH-laid-out (every file's
    * key range spans the whole keyspace — range pruning keeps all files;
    * exactly how an ingest-ordered table looks to a late point query),
    * and [[Layout.bloomIndexWrite]]'s per-file blooms recover the skipping:
    * the probe keys (every o_orderkey ≡ 1 mod 7919 — a handful of point
    * lookups) test each file's 16 KiB bloom driver-side and only
    * candidate files are scanned ([[Layout.BloomLookup]] reports the
    * pruning; `ScaleFeaturesSpec` asserts candidates ≪ files and result
    * ≡ the full-scan filter). No false negatives ⇒ the oracle is the
    * plain WHERE-filter, verbatim semantics.
    */
  private def bloomBase(spark: SparkSession, sfDir: String): String = baseBuildLock.synchronized {
    val root = sessionRoot(sfDir, "bloomidx")
    val dataDir = s"$root/orders"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dataDir))) {
      t(spark, sfDir, "orders")
        .select(col("o_orderkey").as("key"),
          dec(col("o_totalprice")).cast("double").as("totalprice"),
          col("o_orderstatus").as("status"))
        .repartition(8) // hash layout: overlapping ranges, min/max useless
        .write.mode("overwrite").parquet(dataDir)
      Layout.bloomIndexWrite(spark, dataDir, "key")
    }
    dataDir
  }

  def q91BloomLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val dataDir = bloomBase(spark, sfDir)
    // DataFrame probe set: candidate resolution is distributed (the
    // probes' word-masks join the index table), no key collect
    Layout.bloomIndexLookupKeys(spark, dataDir, "key",
      t(spark, sfDir, "orders")
        .filter(col("o_orderkey") % 7919 === 1)
        .select(col("o_orderkey")))
      .result
      .select(col("key"), col("totalprice"), col("status"))
      .orderBy(col("key"))
  }

  val q91Sql: String =
    """SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
      |  o_orderstatus AS status
      |FROM orders WHERE o_orderkey % 7919 = 1
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------- q90
  /** ZERO-COPY SHALLOW CLONE + DIVERGENCE — [[Layout.snapshotClone]]'s
    * read contract: the clone of the q83/q85 versioned table costs one
    * manifest write (zero data I/O — `ScaleFeaturesSpec` asserts no data
    * file is copied), then DIVERGES with its own append while the source
    * stays byte-identical. The query emits both tables side-tagged; the
    * oracle reconstructs each lineage independently, so the equality
    * certifies isolation in both directions — the clone sees the
    * source's full history at clone time plus only its own append, the
    * source never sees the clone's rows. This is the test/dev-clone
    * workflow every lakehouse sells (clone prod, experiment, throw away)
    * priced at metadata.
    */
  private def cloneTable(spark: SparkSession, sfDir: String): String = {
    val src = snapTable(spark, sfDir)
    val cloneRoot = sessionRoot(sfDir, "clone")
    baseBuildLock.synchronized {
      if (Layout.snapshotVersions(spark, cloneRoot).isEmpty) {
        Layout.snapshotClone(spark, src, cloneRoot)
        val base = t(spark, sfDir, "orders")
          .select(col("o_orderkey").as("key"),
            dec(col("o_totalprice")).cast("double").as("totalprice"))
        Layout.snapshotAppend(spark, cloneRoot,
          base.filter(col("key") % 700 === 5)
            .select((col("key") + 40000000L).as("key"), col("totalprice")))
      }
    }
    cloneRoot
  }

  def q90ShallowClone(spark: SparkSession, sfDir: String): DataFrame = {
    val src = snapTable(spark, sfDir)
    val clone = cloneTable(spark, sfDir)
    Layout.readSnapshot(spark, clone).withColumn("side", lit("clone"))
      .unionByName(
        Layout.readSnapshot(spark, src).withColumn("side", lit("src")))
      .select(col("side"), col("key"), col("totalprice"))
      .orderBy(col("side"), col("key"))
  }

  val q90Sql: String =
    """WITH base AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |  FROM orders),
      |src AS (SELECT key, totalprice FROM base
      |  UNION ALL SELECT key + 20000000, totalprice FROM base WHERE key % 500 = 3)
      |SELECT 'clone' AS side, key, totalprice FROM src
      |UNION ALL SELECT 'clone', key + 40000000, totalprice FROM base WHERE key % 700 = 5
      |UNION ALL SELECT 'src', key, totalprice FROM src
      |ORDER BY side, key""".stripMargin

  // ---------------------------------------------------------------- q89
  /** INCREMENTAL JOIN-VIEW MAINTENANCE — q80's IVM discipline lifted from
    * a single-table rollup to the TWO-TABLE inner equi-join, driven by
    * [[Layout.maintainJoinView]]'s bilinear delta rule (ΔV = ΔL ⋈ R_new ∪
    * L_old ⋈ ΔR) with L_old read by TIME TRAVEL — the snapshot layer is
    * what makes textbook IVM exact: the "old" relation is the actual
    * committed version, not a bookkept shadow copy. The demo interleaves
    * appends on BOTH sides (orders keyed by custkey arrive in two
    * batches, customers in two batches) with a maintenance run after
    * each commit, so both delta quadrants (new-orders × customers,
    * old-orders × new-customers) really fire; the final view must equal
    * the plain full join — any double-count or missed quadrant breaks
    * the hash. The view only ever APPENDS deltas (the decomposition is a
    * disjoint multiset partition); broken lineage falls back to a full
    * recompute (spec'd in `SnapshotIvmSpec`).
    * 100 TB: each run joins O(new bytes) against the other side and
    * never re-reads the unchanged×unchanged quadrant — the difference
    * between a nightly full join and a minutes-long incremental one.
    */
  private def ivmJoinView(spark: SparkSession, sfDir: String): String = baseBuildLock.synchronized {
    val root = sessionRoot(sfDir, "ivmj")
    val (lRoot, rRoot, vRoot) = (s"$root/L", s"$root/R", s"$root/V")
    if (Layout.snapshotVersions(spark, vRoot).isEmpty) {
      val L = t(spark, sfDir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_orderkey").as("okey"),
          dec(col("o_totalprice")).cast("double").as("price"))
      val R = t(spark, sfDir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("segment"))
      Layout.snapshotAppend(spark, lRoot, L.filter(col("okey") % 4 =!= 3))
      Layout.snapshotAppend(spark, rRoot, R.filter(col("custkey") % 3 =!= 0))
      Layout.maintainJoinView(spark, lRoot, rRoot, vRoot, "custkey")
      Layout.snapshotAppend(spark, lRoot, L.filter(col("okey") % 4 === 3))
      Layout.maintainJoinView(spark, lRoot, rRoot, vRoot, "custkey")
      Layout.snapshotAppend(spark, rRoot, R.filter(col("custkey") % 3 === 0))
      Layout.maintainJoinView(spark, lRoot, rRoot, vRoot, "custkey")
    }
    vRoot
  }

  def q89IvmJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val vRoot = ivmJoinView(spark, sfDir)
    Layout.readSnapshot(spark, vRoot)
      .select(col("custkey"), col("okey"), col("price"),
        col("acctbal"), col("segment"))
      .orderBy(col("custkey"), col("okey"))
  }

  val q89Sql: String =
    """SELECT o_custkey AS custkey, o_orderkey AS okey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  c_acctbal AS acctbal, c_mktsegment AS segment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY custkey, okey""".stripMargin

  // ---------------------------------------------------------------- q86
  /** REFERENTIAL-INTEGRITY + CONSTRAINT AUDIT over the star schema — the
    * dbt-test / Deequ shape, and q75's schema-level sibling (q75 audits a
    * VALUE stream; this audits the RELATIONSHIPS a warehouse silently
    * corrupts): four FK orphan checks (lineitem→orders, orders→customer,
    * lineitem→part, lineitem→supplier — broadcast LEFT ANTI against the
    * key side, counted), a PK uniqueness check (excess lineitem
    * (orderkey, linenumber) rows over distinct — the synthetic data
    * REALLY violates this, so the check provably fires), and two row
    * constraints (ship-before-order via the FK join — also really
    * violated — and non-positive quantity). One row per check; a clean
    * check reports 0 rather than vanishing (an absent check and a
    * passing check must be distinguishable — the audit-table contract).
    * 100 TB: each FK check is an anti-join counted map-side after a
    * broadcast (dims) or shuffle (fact-fact) — no full materialization;
    * the PK check is one partial-agg distinct; constraints are scan-side
    * conditional sums. The union is 7 one-row aggregates.
    */
  def q86IntegrityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val o = t(spark, sfDir, "orders")
    def cnt(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_violations")).select(lit(name).as("check_name"),
        col("n_violations"))
    val fkLiOrders = cnt("fk_lineitem_orders",
      li.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"),
          "left_anti"))
    val fkOrdersCust = cnt("fk_orders_customer",
      o.select(col("o_custkey"))
        .join(t(spark, sfDir, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti"))
    val fkLiPart = cnt("fk_lineitem_part",
      li.select(col("l_partkey"))
        .join(t(spark, sfDir, "part").select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_anti"))
    val fkLiSupp = cnt("fk_lineitem_supplier",
      li.select(col("l_suppkey"))
        .join(t(spark, sfDir, "supplier").select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti"))
    val pkDup = li.agg((count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber"))).as("n_violations"))
      .select(lit("pk_lineitem_unique").as("check_name"), col("n_violations"))
    val shipOrder = cnt("chk_ship_after_order",
      li.select(col("l_orderkey"), col("l_shipdate"))
        .join(o.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") < col("o_orderdate")))
    val nonneg = cnt("chk_positive_quantity",
      li.filter(col("l_quantity") <= 0))
    fkLiOrders.unionByName(fkOrdersCust).unionByName(fkLiPart)
      .unionByName(fkLiSupp).unionByName(pkDup).unionByName(shipOrder)
      .unionByName(nonneg)
      .orderBy(col("check_name"))
  }

  val q86Sql: String =
    """SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations FROM (
      |  SELECT 'fk_lineitem_orders' AS check_name, count(*) AS n_violations
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderkey IS NULL
      |  UNION ALL
      |  SELECT 'fk_orders_customer', count(*)
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL
      |  UNION ALL
      |  SELECT 'fk_lineitem_part', count(*)
      |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_partkey IS NULL
      |  UNION ALL
      |  SELECT 'fk_lineitem_supplier', count(*)
      |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE s.s_suppkey IS NULL
      |  UNION ALL
      |  SELECT 'pk_lineitem_unique',
      |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'chk_ship_after_order', count(*)
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_shipdate < o.o_orderdate
      |  UNION ALL
      |  SELECT 'chk_positive_quantity', count(*)
      |  FROM lineitem WHERE l_quantity <= 0)
      |ORDER BY check_name""".stripMargin

  // ---------------------------------------------------------------- q87
  /** POINT-IN-TIME join against the SCD2 dimension — the read side of
    * q79, and the join every feature-store / training-data build runs to
    * avoid LABEL LEAKAGE: each probe (an event shifted +1 hour — "what
    * was this key's attribute when the example was observed") attaches
    * the dim VERSION whose validity interval contains its timestamp:
    * equi on (user_id, event_type) + `valid_from ≤ ts < valid_to`
    * (NULL-open current version). Because q79's intervals PARTITION time
    * per key, each probe inside the dim's history matches exactly one
    * version — the spec-grade invariant that distinguishes a correct
    * SCD2 from an overlapping one (and the uniqueness is itself asserted
    * by the oracle equality: a double match would duplicate rows).
    * Probes before the key's first version drop (inner join) — the
    * no-history-yet case a leakage-safe build WANTS dropped rather than
    * filled forward from the future.
    * 100 TB: the equi keys carry the join (hash join, range as residual
    * condition — never a nested loop); both sides shuffle once on
    * (user_id, event_type); at dim-history scale the q20-style as-of
    * merge sweep or the bucketed range rule take over — this is the
    * partition-friendly warehouse form.
    */
  def q87Scd2Pit(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = q79Scd2Dim(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("version"),
        col("valid_from"), col("valid_to"), col("value").as("dim_value"))
    val probes = t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("pts"))
    probes.join(dim, Seq("user_id", "event_type"))
      .filter(col("valid_from") <= col("pts") &&
        (col("valid_to").isNull || col("pts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("version"), col("dim_value"))
      .orderBy(col("event_id"))
  }

  val q87Sql: String =
    """WITH dim AS (
      |  SELECT user_id, event_type, version, valid_from, valid_to, value AS dim_value
      |  FROM (
      |    SELECT user_id, event_type, event_id, ts, value,
      |      row_number() OVER w AS version,
      |      ts AS valid_from, lead(ts, 1) OVER w AS valid_to
      |    FROM (
      |      SELECT user_id, event_type, event_id, ts, value,
      |        lag(value, 1) OVER (PARTITION BY user_id, event_type
      |          ORDER BY ts, event_id) AS prev_value
      |      FROM events)
      |    WHERE prev_value IS NULL OR value <> prev_value
      |    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))),
      |probes AS (
      |  SELECT event_id, user_id, event_type, ts + INTERVAL 1 HOUR AS pts
      |  FROM events)
      |SELECT p.event_id, p.user_id, p.event_type, d.version, d.dim_value
      |FROM probes p JOIN dim d
      |  ON p.user_id = d.user_id AND p.event_type = d.event_type
      |WHERE d.valid_from <= p.pts AND (d.valid_to IS NULL OR p.pts < d.valid_to)
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q79
  /** SCD Type-2 dimension build from a changelog — the history-keeping
    * counterpart of q50's latest-wins compaction (SCD1) and q68/q78's
    * MERGE: every SURVIVING version of a (user_id, event_type) key becomes
    * one dimension row with [valid_from, valid_to) validity, a version
    * number, and an is_current flag. Two SCD2 subtleties, both in the
    * plan: (1) CHANGE COLLAPSE — a changelog row whose value equals the
    * key's previous version is a no-op replay (CDC at-least-once delivery,
    * full-snapshot diffs) and must NOT open a new validity interval: a lag
    * window drops it first; (2) the validity chain [valid_to = next
    * survivor's valid_from, NULL for current] comes from lead AFTER the
    * collapse. Determinism: (ts, event_id) is a unique order per key.
    * 100 TB: ONE shuffle — both window passes AND the collapse filter
    * partition by the same (user_id, event_type) key, so Catalyst plans
    * lag → filter → row_number/lead as consecutive Window operators over a
    * single Exchange (the filter between them is map-side); the output is
    * the classic warehouse dimension, range-partitionable by valid_from
    * for time-travel scans, with is_current = the hot partition.
    */
  def q79Scd2Dim(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("prev_value").isNull || col("value") =!= col("prev_value"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select(col("user_id"), col("event_type"), col("version"),
        col("event_id"), col("valid_from"), col("valid_to"),
        col("value"), col("is_current"))
      .orderBy(col("user_id"), col("event_type"), col("version"))
  }

  val q79Sql: String =
    """WITH collapsed AS (
      |  SELECT user_id, event_type, event_id, ts, value FROM (
      |    SELECT user_id, event_type, event_id, ts, value,
      |      lag(value) OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts, event_id) AS prev_value
      |    FROM events)
      |  WHERE prev_value IS NULL OR value <> prev_value)
      |SELECT user_id, event_type,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  event_id, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to, value,
      |  CAST(lead(ts) OVER w IS NULL AS INT) AS is_current
      |FROM collapsed
      |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
      |ORDER BY user_id, event_type, version""".stripMargin

  // ---------------------------------------------------------------- q80
  /** INCREMENTAL VIEW MAINTENANCE of a materialized aggregate — the
    * standing-dashboard shape: a per-status revenue rollup is materialized
    * ONCE (state table, O(groups) rows), and each arriving order batch
    * merges into it by aggregating ONLY the delta and full-outer-combining
    * partial states — sum/count are MERGEABLE, avg re-derives from them
    * (never merge avgs). IVM ≡ full recompute over base ∪ delta is the
    * oracle; the plan spec asserts the merged query scans `orders` exactly
    * once (the delta side) — the materialized state substitutes for the
    * base rescan, which is the entire point.
    * 100 TB: recompute cost O(|delta| + |groups|) per refresh instead of
    * O(|base|); the state table is group-count-bounded (here 3 rows), so
    * the combine's full-outer join moves O(groups) partial rows (a
    * shuffle of counters, never history — full outer can't broadcast,
    * and doesn't need to at this cardinality).
    * Streaming twin: ST1's update-mode agg IS this maintained continuously;
    * q80 is the batch/nightly form a warehouse runs.
    */
  def q80IvmAgg(spark: SparkSession, sfDir: String): DataFrame = {
    // callers pre-cast `p` (state: exact (18,2); delta: the exact scale-4
    // half-price product — re-casting it to scale 2 here would round each
    // item and drift from the full-recompute oracle)
    val agg = (df: DataFrame) => df
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("p")).as("rev"), count(lit(1)).as("n"))
    // once-per-session+SF materialization of the standing state table
    val stateDir = sessionRoot(sfDir, "ivm")
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(stateDir)))
      agg(t(spark, sfDir, "orders")
        .select(col("o_orderstatus"), dec(col("o_totalprice")).as("p")))
        .write.mode("overwrite").parquet(stateDir)
    val state = spark.read.parquet(stateDir)
      .select(col("o_orderstatus"), col("rev").as("rev_s"), col("n").as("n_s"))
    // the arriving batch: re-keyed discount re-bookings (every 13th order,
    // half price) — same status domain, so every group pre-exists AND the
    // merge must also handle a delta-only group if one ever appears
    val delta = agg(t(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 13 === 4)
      .select(col("o_orderstatus"),
        (dec(col("o_totalprice")) * lit(0.5).cast("decimal(18,2)")).as("p")))
      .select(col("o_orderstatus"), col("rev").as("rev_d"), col("n").as("n_d"))
    state.join(delta, Seq("o_orderstatus"), "full_outer")
      .select(col("o_orderstatus"),
        (coalesce(col("rev_s"), lit(0)) + coalesce(col("rev_d"), lit(0)))
          .cast("double").as("revenue"),
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_orders"))
      .withColumn("avg_price", round(col("revenue") / col("n_orders"), 4))
      .orderBy(col("o_orderstatus"))
  }

  val q80Sql: String =
    """WITH unioned AS (
      |  SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus,
      |    CAST(o_totalprice AS DECIMAL(18,2))
      |      * CAST(0.5 AS DECIMAL(18,2)) AS p
      |  FROM orders WHERE o_orderkey % 13 = 4),
      |full_recompute AS (
      |  SELECT o_orderstatus, CAST(sum(p) AS DOUBLE) AS revenue,
      |    count(*) AS n_orders
      |  FROM unioned GROUP BY o_orderstatus)
      |SELECT o_orderstatus, revenue, n_orders,
      |  round(revenue / n_orders, 4) AS avg_price
      |FROM full_recompute ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q81
  /** TRIANGLE COUNTING with degree-ordered orientation — the fourth graph
    * shape (CC fixpoint, PageRank mass flow, BFS frontier, and now the
    * WEDGE-CLOSURE family behind clustering coefficients / cohesion
    * metrics / graph features for curation). Graph: parts co-purchased in
    * ≥ [[Q81MinCo]] distinct orders (the co-occurrence build is itself a
    * partial-aggregated groupBy; the threshold prunes to a sparse graph).
    * The scale move is the ORIENTATION: each undirected edge directs from
    * lower (degree, id) to higher, so every node's OUT-degree is O(√m)
    * regardless of its raw degree — the naive wedge join explodes
    * quadratically on power-law hubs (a 10⁶-degree hub = 10¹² wedges);
    * oriented, the wedge join volume is Σ outdeg² ≤ m·√m, the classic
    * bound. A triangle {a,b,c} (ranks a<b<c) is counted EXACTLY once: as
    * the wedge a→b, a→c closed by the oriented edge b→c.
    * 100 TB: co-occurrence agg shuffles on the pair key; the wedge join
    * shuffles oriented edges on src; the closure probe is an equi-join on
    * (b, c) — three well-keyed shuffles, no unbounded intermediate.
    * Oracle: an INDEPENDENT formulation — plain three-way undirected
    * self-join with i<j<k (no orientation) — so the orientation trick
    * itself is what the equality certifies.
    */
  val Q81MinCo = 2

  def q81Triangles(spark: SparkSession, sfDir: String): DataFrame = {
    val l = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val co = l.alias("a").join(l.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("i"), col("b.p").as("j"))
      .agg(countDistinct(col("a.o")).as("c"))
      .filter(col("c") >= Q81MinCo)
      .select(col("i"), col("j"))
      .pin() // read 3×: degrees, wedge sides, closure probe
    val deg = co.select(explode(array(col("i"), col("j"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val lower = (da: Column, a: Column, db: Column, b: Column) =>
      da < db || (da === db && a < b)
    val directed = co
      .join(deg.select(col("n").as("i"), col("d").as("di")), Seq("i"))
      .join(deg.select(col("n").as("j"), col("d").as("dj")), Seq("j"))
      .select(
        when(lower(col("di"), col("i"), col("dj"), col("j")), col("i"))
          .otherwise(col("j")).as("src"),
        when(lower(col("di"), col("i"), col("dj"), col("j")), col("j"))
          .otherwise(col("i")).as("dst"),
        when(lower(col("di"), col("i"), col("dj"), col("j")), col("dj"))
          .otherwise(col("di")).as("ddst"))
      .pin() // wedge self-join + closure probe
    val wedges = directed.alias("x").join(directed.alias("y"),
        col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("a"), col("x.dst").as("b"), col("y.dst").as("c"))
    val tri = wedges.join(directed.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"), "left_semi")
    tri.select(sort_array(array(col("a"), col("b"), col("c"))).as("t"))
      .select(element_at(col("t"), 1).as("i"), element_at(col("t"), 2).as("j"),
        element_at(col("t"), 3).as("k"))
      .orderBy(col("i"), col("j"), col("k"))
  }

  val q81Sql: String =
    s"""WITH co AS (
      |  SELECT a.l_partkey AS i, b.l_partkey AS j
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= $Q81MinCo)
      |SELECT e1.i AS i, e1.j AS j, e2.j AS k
      |FROM co e1
      |JOIN co e2 ON e2.i = e1.i AND e2.j > e1.j
      |JOIN co e3 ON e3.i = e1.j AND e3.j = e2.j
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Ordered conversion funnel (signup → view → purchase, each step within
    * 7 days of the previous) — the event-sequence analytics shape. Three
    * stacked unbounded window aggregates over ONE user partitioning: step
    * k's earliest qualifying timestamp is a conditional min that references
    * step k−1's, so the whole funnel evaluates in a single shuffle + a
    * single per-partition pass (no self-joins, no per-step scans — the
    * 3-join formulation reads the fact table three times at 100 TB; this
    * reads it once). The final per-user collapse rides the same
    * partitioning (Exchange reuse).
    */
  def q70Funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val wk = 7L * 86400 * 1000000 // 7 days in µs
    val byUser = Window.partitionBy(col("user_id"))
    t(spark, sfDir, "events")
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "view" && col("ts") >= col("t1") &&
          graft.functions.epochUs(col("ts")) - graft.functions.epochUs(col("t1")) <= wk, col("ts")))
          .over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t2") &&
          graft.functions.epochUs(col("ts")) - graft.functions.epochUs(col("t2")) <= wk, col("ts")))
          .over(byUser))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t_signup"), min(col("t2")).as("t_view"),
        min(col("t3")).as("t_purchase"))
      .withColumn("stage",
        when(col("t_signup").isNull, 0L).when(col("t_view").isNull, 1L)
          .when(col("t_purchase").isNull, 2L).otherwise(3L))
      .orderBy(col("user_id"))
  }

  val q70Sql: String =
    """WITH w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
      |              OVER (PARTITION BY user_id) AS t1 FROM events),
      |w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts >= t1
      |           AND epoch_us(ts) - epoch_us(t1) <= 604800000000 THEN ts END)
      |         OVER (PARTITION BY user_id) AS t2 FROM w1),
      |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2
      |           AND epoch_us(ts) - epoch_us(t2) <= 604800000000 THEN ts END)
      |         OVER (PARTITION BY user_id) AS t3 FROM w2)
      |SELECT user_id, min(t1) AS t_signup, min(t2) AS t_view,
      |  min(t3) AS t_purchase,
      |  CAST(CASE WHEN min(t1) IS NULL THEN 0 WHEN min(t2) IS NULL THEN 1
      |       WHEN min(t3) IS NULL THEN 2 ELSE 3 END AS BIGINT) AS stage
      |FROM w3 GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Weekly cohort retention: cohort = ISO week of the user's first event,
    * retention cell (cohort_week, week_offset) = distinct users active that
    * many weeks later. Two aggregations over the SAME user_id shuffle key
    * (first-seen, then the join-back rides the same partitioning) and one
    * final (cohort, offset) rollup; offsets are exact integer µs floor
    * division, so both engines bucket identically.
    */
  def q71CohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val wk = 7L * 86400 * 1000000
    val firstSeen = t(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    t(spark, sfDir, "events")
      .join(firstSeen, Seq("user_id"))
      .withColumn("week_offset",
        floor((graft.functions.epochUs(col("ts")) - graft.functions.epochUs(col("cohort_week")))
          .cast("double") / wk).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q71Sql: String =
    """WITH first_seen AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(floor(CAST(epoch_us(ts) - epoch_us(cohort_week) AS DOUBLE)
      |       / 604800000000) AS BIGINT) AS week_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM events JOIN first_seen USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  // ---------------------------------------------------------------- q72
  /** Time-series resample + forward fill (the pandas `resample('1h')` /
    * `ffill` surface): per-user hourly grid from first to last event hour
    * (sequence + explode — generated map-side, never shuffled wide), left
    * join of per-hour closing stats, then gap hours forward-fill the last
    * observed close via an IGNORE NULLS running last. The close is an
    * arg-max on an exact integer (µs-offset, event_id) key, so both
    * engines pick the same row without float or arrival-order ties.
    * Bounded to users 0-9 so the grid is SF-invariant; the plan shape
    * (agg → generate → join → window, all on the user_id key) is the
    * 100 TB one — the grid explode multiplies rows AFTER the per-user
    * reduction, not before.
    */
  def q72ResampleFfill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events").filter(col("user_id") < 10)
    // exact scalar tiebreak: µs offset within the hour (< 3.6e9) · 1e8 + id
    val closeKey = (graft.functions.epochUs(col("ts")) -
      graft.functions.epochUs(date_trunc("hour", col("ts")))) * lit(100000000L) + col("event_id")
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("value"), closeKey).as("v_close"))
    val spine = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v_close"), ignoreNulls = true).over(byUser).as("v_ffill"))
      .orderBy(col("user_id"), col("hour"))
  }

  val q72Sql: String =
    """WITH ev AS (SELECT * FROM events WHERE user_id < 10),
      |hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events,
      |    arg_max(value, (epoch_us(ts) - epoch_us(date_trunc('hour', ts)))
      |                   * 100000000 + event_id) AS v_close
      |  FROM ev GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(date_trunc('hour', min(ts)),
      |    date_trunc('hour', max(ts)), INTERVAL 1 HOUR)) AS hour
      |  FROM ev GROUP BY user_id)
      |SELECT user_id, hour, coalesce(n_events, 0) AS n_events,
      |  last_value(v_close IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
      |FROM spine LEFT JOIN hourly USING (user_id, hour)
      |ORDER BY user_id, hour""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Morton z-value computation (the arithmetic under Layout.zOrderWrite,
    * oracle-pinned): interleave 16 bits of customer key and order-date day
    * number. The layout operator itself is spec-gated (file-skipping is a
    * metrics property, not a result set) — this query pins the bit
    * interleave both engines must agree on. The % 65536 folds keep the SQL
    * static across SFs; real layouts scale by min-max/quantile binning
    * instead (folding breaks locality).
    */
  def q73ZValue(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        graft.functions.zvalue(16,
          pmod(col("o_custkey"), lit(65536L)),
          pmod(datediff(col("o_orderdate"), lit("1995-01-01")).cast("long"),
            lit(65536L))).as("zv"))
      .orderBy(col("o_orderkey"))

  val q73Sql: String =
    s"""SELECT o_orderkey, ${graft.functions.sqlZValue(16, Seq(
         "o_custkey % 65536",
         "date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) % 65536"))} AS zv
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q75
  /** Data-quality constraint audit (the Deequ/dbt-test slot): the standing
    * metrics job every production pipeline runs before publishing a table
    * — PK uniqueness, FK integrity, completeness, domain ranges, and a
    * cross-table temporal consistency rule, emitted as one tall
    * (check_name, violations) audit table.
    *
    * Scale shape: all single-table rules FUSE into one conditional-sum
    * aggregate per table (one scan each, partial map-side, 1 row out —
    * adding a rule costs a column, not a scan); the two FK rules are
    * anti-joins (dim side broadcast/bloom-pruned at scale, as
    * ScaleFeaturesSpec demonstrates for the same shape); the temporal rule
    * rides the lineitem⋈orders equi-join. The audit never ships row data
    * — every branch reduces to ONE counter before the union.
    */
  def q75QualityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer")
    val o = t(spark, sfDir, "orders")
    val l = t(spark, sfDir, "lineitem")
    def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    val ordersChecks = o.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("orders_pk_dups"),
        cnt(col("o_totalprice") <= 0).as("orders_nonpos_price"))
    val lineitemChecks = l.agg(
        (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
          .as("lineitem_pk_dups"),
        cnt(col("l_quantity") < 1 || col("l_quantity") > 50)
          .as("lineitem_qty_out_of_range"),
        cnt(col("l_discount") < 0 || col("l_discount") > 1)
          .as("lineitem_discount_out_of_range"))
    val customerChecks = c.agg(
        cnt(col("c_name").isNull || col("c_name") === "")
          .as("customer_missing_name"))
    val ordersFk = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orders_fk_violations"))
    val lineitemFk = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_fk_violations"))
    val shipBeforeOrder = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .agg(cnt(col("l_shipdate") < col("o_orderdate"))
        .as("lineitem_ship_before_order"))
    def tall(df: DataFrame): DataFrame = {
      val cols = df.columns
      df.select(explode(map(
        cols.flatMap(n => Seq(lit(n), col(n).cast("long"))): _*)))
        .toDF("check_name", "violations")
    }
    Seq(ordersChecks, lineitemChecks, customerChecks, ordersFk, lineitemFk,
      shipBeforeOrder).map(tall).reduce(_ unionAll _)
      .orderBy(col("check_name"))
  }

  val q75Sql: String =
    """SELECT * FROM (
      |  SELECT 'orders_pk_dups' AS check_name,
      |    count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
      |  UNION ALL SELECT 'orders_nonpos_price', count(*) FILTER (o_totalprice <= 0) FROM orders
      |  UNION ALL SELECT 'lineitem_pk_dups',
      |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
      |  UNION ALL SELECT 'lineitem_qty_out_of_range',
      |    count(*) FILTER (l_quantity < 1 OR l_quantity > 50) FROM lineitem
      |  UNION ALL SELECT 'lineitem_discount_out_of_range',
      |    count(*) FILTER (l_discount < 0 OR l_discount > 1) FROM lineitem
      |  UNION ALL SELECT 'customer_missing_name',
      |    count(*) FILTER (c_name IS NULL OR c_name = '') FROM customer
      |  UNION ALL SELECT 'orders_fk_violations', count(*) FROM orders
      |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL SELECT 'lineitem_fk_violations', count(*) FROM lineitem
      |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL SELECT 'lineitem_ship_before_order',
      |    count(*) FILTER (l_shipdate < o_orderdate)
      |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |ORDER BY check_name""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Trailing time-RANGE window frame — `RANGE BETWEEN 6 PRECEDING AND
    * CURRENT ROW` over integer order-date days: each order's 7-day
    * trailing order count and exact DECIMAL revenue for its customer (the
    * velocity feature ROWS frames get wrong whenever event spacing is
    * irregular — a ROWS frame counts rows, a RANGE frame counts TIME).
    * One shuffle on custkey + one sort serves both frame aggregates;
    * frame arithmetic is on integer day offsets and the money sum is
    * DECIMAL, so both engines agree exactly.
    * 100 TB: identical shape to any per-key window — partition by the
    * entity, per-partition sort, single pass with a sliding frame; no
    * self-join (the naive trailing-window formulation is an O(rows ×
    * window) range self-join).
    */
  def q77TrailingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val d = datediff(col("o_orderdate"), lit("1990-01-01")).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-6, Window.currentRow)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), d.as("d"),
        dec(col("o_totalprice")).as("price"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("rev_7d", round(sum(col("price")).over(w), 2).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("d").as("order_day"),
        col("n_7d"), col("rev_7d"))
      .orderBy(col("o_orderkey"))
  }

  val q77Sql: String =
    """SELECT o_custkey, o_orderkey, order_day, n_7d, rev_7d FROM (
      |  SELECT o_custkey, o_orderkey,
      |    date_diff('day', TIMESTAMP '1990-01-01', o_orderdate) AS order_day,
      |    count(*) OVER w AS n_7d,
      |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS rev_7d
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |    ORDER BY date_diff('day', TIMESTAMP '1990-01-01', o_orderdate)
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q106
  /** POSITION-DELETE READ ON THE ORACLE GATE — an arbitrary-predicate
    * DELETE on a table with NO unique key (lineitem keeps duplicate
    * orderkeys), committed as a (file, ordinal) sidecar
    * ([[Layout.snapshotDeletePositions]] — Iceberg position deletes /
    * Delta deletion vectors): zero data files rewritten, O(matched
    * rows) of metadata, and the read masks by the scan's hidden
    * `_metadata.row_index`. The oracle recomputes the survivors with a
    * plain `WHERE NOT (...)` — row-exact equality proves the ordinal
    * mask deletes exactly the matched rows and nothing sharing their
    * keys. 100 TB: this is the GDPR/quality-purge delete shape — a
    * predicate over a petabyte corpus priced at one scan plus KBs of
    * sidecar instead of rewriting every touched file.
    */
  private def posDelTable(spark: SparkSession, sfDir: String): String =
    baseBuildLock.synchronized {
      val root = sessionRoot(sfDir, "posdel") + "/q106t"
      if (Layout.snapshotVersions(spark, root).isEmpty) {
        val base = t(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("key"),
            dec(col("l_quantity")).cast("double").as("qty"),
            col("l_returnflag").as("flag"),
            col("l_linestatus").as("status"))
          .repartition(4)
        Layout.snapshotAppend(spark, root, base)
        Layout.snapshotDeletePositions(spark, root,
          col("flag") === "R" && col("qty") > 30)
      }
      root
    }

  def q106PosDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val root = posDelTable(spark, sfDir)
    Layout.readSnapshot(spark, root)
      .groupBy(col("flag"), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("key")).as("sum_key"))
      .orderBy(col("flag"), col("status"))
  }

  val q106Sql: String =
    """SELECT l_returnflag AS flag, l_linestatus AS status,
      |  count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sum_key
      |FROM lineitem
      |WHERE NOT (l_returnflag = 'R'
      |  AND CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) > 30)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- registry
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_quality_audit" -> (q75QualityAudit _),
    "q77_trailing_window" -> (q77TrailingWindow _),
    "q70_funnel" -> (q70Funnel _),
    "q73_zvalue" -> (q73ZValue _),
    "q71_cohort_retention" -> (q71CohortRetention _),
    "q72_resample_ffill" -> (q72ResampleFfill _),
    "q59_priority_lines" -> (q59PriorityLines _),
    "q60_promo_share" -> (q60PromoShare _),
    "q61_returned_revenue" -> (q61ReturnedRevenue _),
    "q62_forecast_revenue" -> (q62ForecastRevenue _),
    "q63_volume_shipping" -> (q63VolumeShipping _),
    "q64_market_share" -> (q64MarketShare _),
    "q65_product_profit" -> (q65ProductProfit _),
    "q66_part_promotion" -> (q66PartPromotion _),
    "q67_window_zoo" -> (q67WindowZoo _),
    "q68_upsert_merge" -> (q68UpsertMerge _),
    "q78_cow_merge" -> (q78CowMerge _),
    "q82_targeted_delete" -> (q82TargetedDelete _),
    "q83_time_travel" -> (q83TimeTravel _),
    "q85_snapshot_cdf" -> (q85SnapshotCdf _),
    "q88_mor_delete" -> (q88MorDelete _),
    "q89_ivm_join" -> (q89IvmJoin _),
    "q90_shallow_clone" -> (q90ShallowClone _),
    "q91_bloom_lookup" -> (q91BloomLookup _),
    "q92_schema_evolution" -> (q92SchemaEvolution _),
    "q93_snapshot_merge" -> (q93SnapshotMerge _),
    "q94_partition_prune" -> (q94PartitionPrune _),
    "q95_snapshot_lookup" -> (q95SnapshotLookup _),
    "q96_range_read" -> (q96RangeRead _),
    "q97_catalyst_table" -> (q97CatalystTable _),
    "q98_sql_table" -> (q98SqlTable _),
    "q99_time_slice" -> (q99TimeSlice _),
    "q100_dpp_join" -> (q100DppJoin _),
    "q101_rename_read" -> (q101RenameRead _),
    "q102_partition_overwrite" -> (q102PartitionOverwrite _),
    "q103_multi_clause_merge" -> (q103MultiClauseMerge _),
    "q104_transform_star_join" -> (q104TransformStarJoin _),
    "q105_bucket_join" -> (q105BucketJoin _),
    "q106_pos_delete" -> (q106PosDelete _),
    "q86_integrity_audit" -> (q86IntegrityAudit _),
    "q87_scd2_pit" -> (q87Scd2Pit _),
    "q79_scd2_dim" -> (q79Scd2Dim _),
    "q80_ivm_agg" -> (q80IvmAgg _),
    "q81_triangles" -> (q81Triangles _),
    "q69_asof_forward" ->
      ((s: SparkSession, d: String) => AsOfJoin.viewsToNextPurchase(s, d)),
    "q50_cdc_compact" -> (q50CdcCompact _),
    "q51_sole_blame" -> (q51SoleBlame _),
    "q53_profile" -> (q53Profile _),
    "q54_count_distribution" -> (q54CountDistribution _),
    "q55_top_revenue_supplier" -> (q55TopRevenueSupplier _),
    "q56_supplier_cnt" -> (q56SupplierCnt _),
    "q57_disjunctive_predicate" -> (q57DisjunctivePredicate _),
    "q58_large_volume_orders" -> (q58LargeVolumeOrders _),
    "q52_value_share" -> (q52ValueShare _),
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_multi_join" -> (q4MultiJoin _),
    "q5_sort_limit" -> (q5SortLimit _),
    "q6_distinct" -> (q6Distinct _),
    "q7_window_rank" -> (q7WindowRank _),
    "q8_window_running" -> (q8WindowRunning _),
    "q9_semi_join" -> (q9SemiJoin _),
    "q10_anti_join" -> (q10AntiJoin _),
    "q11_union_agg" -> (q11UnionAgg _),
    "q12_rollup" -> (q12Rollup _),
    "q13_cube" -> (q13Cube _),
    "q14_pivot" -> (q14Pivot _),
    "q15_string_funcs" -> (q15StringFuncs _),
    "q16_date_agg" -> (q16DateAgg _),
    "q17_scalar_subquery" -> (q17ScalarSubquery _),
    "q18_in_subquery" -> (q18InSubquery _),
    "q19_range_join" -> (q19RangeJoin _),
    "q20_asof_join" -> (q20AsOfJoin _),
    "q21_topk_per_group" -> (q21TopKPerGroup _),
    "q22_percentile" -> (q22Percentile _),
    "q23_histogram" -> (q23Histogram _),
    "q24_sessionize" -> (q24Sessionize _),
    "q25_skew_agg" -> (q25SkewAgg _),
    "q26_grouping_sets" -> (q26GroupingSets _),
    "q27_explode" -> (q27Explode _),
    "q28_null_ops" -> (q28NullOps _),
    "q29_window_stats" -> (q29WindowStats _),
    "q30_set_ops" -> (q30SetOps _),
    "q31_outer_join" -> (q31OuterJoin _),
    "q32_math_funcs" -> (q32MathFuncs _),
    "q33_json" -> (q33Json _),
    "q34_date_parts" -> (q34DateParts _),
    "q35_moving_avg" -> (q35MovingAvg _),
    "q36_geomean" -> (q36GeomMean _),
    "q37_above_avg_inactive" -> (q37AboveAvgInactive _),
    "q38_argmin_per_group" -> (q38ArgminPerGroup _),
    "q39_having" -> (q39Having _),
    "q40_exists_agg" -> (q40ExistsAgg _),
    "q41_range_frame" -> (q41RangeFrame _),
    "q42_bag_set_ops" -> (q42BagSetOps _),
    "q43_lateral" -> (q43Lateral _),
    "q44_first_last" -> (q44FirstLast _),
    "q45_unpivot" -> (q45Unpivot _),
    "q46_weighted_avg" -> (q46WeightedAvg _),
    "q47_bucket_range_join" -> (q47BucketRangeJoin _),
    "q48_salted_join" -> (q48SaltedJoin _),
    "q49_bucketed_join" -> (q49BucketedJoin _))

  val sql: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q2_filter_project" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_multi_join" -> q4Sql,
    "q5_sort_limit" -> q5Sql,
    "q6_distinct" -> q6Sql,
    "q7_window_rank" -> q7Sql,
    "q8_window_running" -> q8Sql,
    "q9_semi_join" -> q9Sql,
    "q10_anti_join" -> q10Sql,
    "q11_union_agg" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_cube" -> q13Sql,
    "q14_pivot" -> q14Sql,
    "q15_string_funcs" -> q15Sql,
    "q16_date_agg" -> q16Sql,
    "q17_scalar_subquery" -> q17Sql,
    "q18_in_subquery" -> q18Sql,
    "q19_range_join" -> q19Sql,
    "q20_asof_join" -> q20Sql,
    "q21_topk_per_group" -> q21Sql,
    "q22_percentile" -> q22Sql,
    "q23_histogram" -> q23Sql,
    "q24_sessionize" -> q24Sql,
    "q25_skew_agg" -> q25Sql,
    "q26_grouping_sets" -> q26Sql,
    "q27_explode" -> q27Sql,
    "q28_null_ops" -> q28Sql,
    "q29_window_stats" -> q29Sql,
    "q30_set_ops" -> q30Sql,
    "q31_outer_join" -> q31Sql,
    "q32_math_funcs" -> q32Sql,
    "q33_json" -> q33Sql,
    "q34_date_parts" -> q34Sql,
    "q35_moving_avg" -> q35Sql,
    "q36_geomean" -> q36Sql,
    "q37_above_avg_inactive" -> q37Sql,
    "q38_argmin_per_group" -> q38Sql,
    "q39_having" -> q39Sql,
    "q40_exists_agg" -> q40Sql,
    "q41_range_frame" -> q41Sql,
    "q42_bag_set_ops" -> q42Sql,
    "q43_lateral" -> q43Sql,
    "q44_first_last" -> q44Sql,
    "q45_unpivot" -> q45Sql,
    "q46_weighted_avg" -> q46Sql,
    "q47_bucket_range_join" -> q47Sql,
    "q48_salted_join" -> q48Sql,
    "q49_bucketed_join" -> q49Sql,
    "q50_cdc_compact" -> q50Sql,
    "q51_sole_blame" -> q51Sql,
    "q53_profile" -> q53Sql,
    "q54_count_distribution" -> q54Sql,
    "q55_top_revenue_supplier" -> q55Sql,
    "q56_supplier_cnt" -> q56Sql,
    "q57_disjunctive_predicate" -> q57Sql,
    "q58_large_volume_orders" -> q58Sql,
    "q59_priority_lines" -> q59Sql,
    "q60_promo_share" -> q60Sql,
    "q61_returned_revenue" -> q61Sql,
    "q62_forecast_revenue" -> q62Sql,
    "q63_volume_shipping" -> q63Sql,
    "q64_market_share" -> q64Sql,
    "q65_product_profit" -> q65Sql,
    "q66_part_promotion" -> q66Sql,
    "q67_window_zoo" -> q67Sql,
    "q68_upsert_merge" -> q68Sql,
    "q78_cow_merge" -> q78Sql,
    "q82_targeted_delete" -> q82Sql,
    "q83_time_travel" -> q83Sql,
    "q85_snapshot_cdf" -> q85Sql,
    "q88_mor_delete" -> q88Sql,
    "q89_ivm_join" -> q89Sql,
    "q90_shallow_clone" -> q90Sql,
    "q91_bloom_lookup" -> q91Sql,
    "q92_schema_evolution" -> q92Sql,
    "q93_snapshot_merge" -> q93Sql,
    "q94_partition_prune" -> q94Sql,
    "q95_snapshot_lookup" -> q95Sql,
    "q96_range_read" -> q96Sql,
    "q97_catalyst_table" -> q96Sql,
    "q98_sql_table" -> q96Sql,
    "q100_dpp_join" -> q100Sql,
    "q101_rename_read" -> q101Sql,
    "q102_partition_overwrite" -> q102Sql,
    "q103_multi_clause_merge" -> q103Sql,
    "q104_transform_star_join" -> q104Sql,
    "q105_bucket_join" -> q105Sql,
    "q106_pos_delete" -> q106Sql,
    "q99_time_slice" ->
      """SELECT o_orderkey AS key, o_orderdate AS odate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY key""".stripMargin,
    "q86_integrity_audit" -> q86Sql,
    "q87_scd2_pit" -> q87Sql,
    "q79_scd2_dim" -> q79Sql,
    "q80_ivm_agg" -> q80Sql,
    "q81_triangles" -> q81Sql,
    "q69_asof_forward" -> AsOfJoin.q69Sql,
    "q70_funnel" -> q70Sql,
    "q75_quality_audit" -> q75Sql,
    "q77_trailing_window" -> q77Sql,
    "q73_zvalue" -> q73Sql,
    "q71_cohort_retention" -> q71Sql,
    "q72_resample_ffill" -> q72Sql,
    "q52_value_share" -> q52Sql)
}
