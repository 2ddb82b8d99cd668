package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * Each table is a single parquet file; on a real cluster these would be
  * multi-file datasets and the same `spark.read.parquet(dir)` call scales
  * unchanged (splittable files, partition pruning, pushdown all apply).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize per (session, dir, table): spark.read.parquet re-lists files
  // and re-reads footers on every call, and a 50-query suite touches each
  // table many times. The cached DataFrame is just a logical plan — reusing
  // it also lets Catalyst's ReuseExchange spot identical subplans.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name), {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright (PARQUET_TYPE_ILLEGAL). Read it as a raw long and truncate
      // to µs — the same truncation DuckDB applies when it loads nanos into
      // its µs timestamps, so oracle comparisons agree.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })

  /** Register all tables as temp views named after the table, for SQL use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
