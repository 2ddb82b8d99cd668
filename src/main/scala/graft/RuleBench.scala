package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure BucketedRangeJoinRule's rewrite vs the nested loop on
  * the same range theta-join (orders probed against part-derived intervals).
  * Usage: runMain graft.RuleBench [sfDir] [width]
  */
object RuleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val width = args.lift(1).map(_.toLong).getOrElse(1000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probe = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    def intervals = Tables(spark, sfDir, "part")
      .select(col("p_partkey"), (col("p_retailprice") * 50).as("lo"),
        (col("p_retailprice") * 50 + 2000).as("hi"))
    def joined = probe.join(intervals,
      col("o_totalprice") >= col("lo") && col("o_totalprice") <= col("hi"))
    def time(tag: String): Long = {
      val t0 = System.nanoTime()
      val n = joined.count()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      n
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warm up
    val slow = time("nested-loop (no rule)")
    val rule = plans.BucketedRangeJoinRule(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    spark.conf.set(rule.WidthConf, width.toString)
    val fast = time(s"bucketed (rule, W=$width)")
    require(slow == fast, s"result mismatch: $slow vs $fast")
    spark.stop()
  }
}
