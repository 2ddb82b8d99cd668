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

  /** Reader confs every graft session needs before touching the testdata:
    *
    * - `nanosAsLong`: events.ts was parquet TIMESTAMP(NANOS) in early
    *   testdata drops, which Spark 4 rejects outright
    *   (PARQUET_TYPE_ILLEGAL); read it as a raw long and convert below.
    * - `inferTimestampNTZ=false`: the current drop writes µs with
    *   isAdjustedToUTC=false (pandas/pyarrow default), which Spark 4 would
    *   infer as TIMESTAMP_NTZ — a type `unix_millis`/`unix_micros` and
    *   streaming watermarks all reject. With inference off the scan column
    *   is plain TIMESTAMP holding the same micros (exact under the UTC
    *   session timezone every entry point pins), filters on it still push
    *   down to parquet (a post-scan cast would block that), and every
    *   downstream operator sees the event-time type it was built for.
    */
  def readerConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // ObjectHashAggregate (every typed-Aggregator UDAF: TopKAgg, the
    // sketch family) falls back to SORT-BASED aggregation after a mere
    // 128 distinct keys per partition (Spark's default) — which SORTS
    // THE ENTIRE INPUT STREAM per partition. For s15's top-k over the
    // ~10⁹-row candidate pair stream that silently re-introduced the
    // quadratic disk spill the stream-bound restructure exists to
    // prevent (measured: d20 died of SPILL_OUT_OF_MEMORY at the sf10
    // rung with 70 GB free). Our aggregation buffers are small and
    // bounded (k-row top-k, KB-scale sketches), so the hash map is the
    // right regime at ANY key count the corpus can produce: raise the
    // fallback threshold so it never triggers.
    //
    // ESCAPE HATCH: the raise applies session-wide — to any UDAF a user
    // runs in a graft session, including one with UNBOUNDED per-group
    // buffers (a collect_list-style aggregator), which would now OOM
    // rather than degrade to sort+spill. Such a deployment sets
    // spark.graft.objectHashFallbackThreshold (e.g. back to Spark's
    // default 128) and graft applies THAT value instead; graft's own
    // aggregators are all bounded-buffer, so correctness never depends
    // on the setting — only the pair-family throughput does.
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      spark.conf.get(ObjectHashFallbackConf, "100000000"))
  }

  /** See [[readerConfs]]: overrides the ObjectHashAggregate sort-fallback
    * threshold graft applies (default 10⁸ — hash mode everywhere). */
  val ObjectHashFallbackConf = "spark.graft.objectHashFallbackThreshold"

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name), {
      readerConfs(spark)
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events") df.schema("ts").dataType match {
        case LongType =>
          // nanos drop: truncate to µs — the same truncation DuckDB
          // applies loading nanos, so oracle comparisons agree.
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // belt-and-suspenders: if inference still yielded NTZ (conf
          // ignored by a future Spark), localize in the session tz (UTC).
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
      else df
    })

  /** Register all tables as temp views named after the table, for SQL use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
