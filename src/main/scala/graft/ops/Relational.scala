package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator library (SURVEY.md §2.2).
  *
  * Numeric-parity policy for the DuckDB oracle: sums over money columns go
  * through exact DECIMAL arithmetic, are rounded at a scale where the true
  * rational value lies exactly on the rounding grid, and are cast to DOUBLE
  * at the output — both engines then produce bit-identical doubles. Ratios
  * (averages) are computed as double-division of those exact components with
  * identical expressions on both sides.
  */
object Relational {

  private def dec(c: Column, scale: Int = 2): Column =
    c.cast(s"decimal(18,$scale)")

  /** TPC-H Q1 shape: scan → filter → groupBy → multi-aggregate.
    * At 100 TB: partial aggregation happens map-side (hash agg), only
    * |groups| rows shuffle; the shipdate filter and 7-column projection
    * push down to the parquet scan.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_base_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))), 4)
          .cast("double").as("sum_disc_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
          * (lit(1).cast("decimal(18,2)") + dec(col("l_tax")))), 6).cast("double").as("sum_charge"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 4) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 6) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
