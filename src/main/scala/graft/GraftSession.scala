package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Local mode sizes shuffle partitions to the core count (Spark's default
  * 200 just fragments tiny datasets); on a cluster pass
  * `shufflePartitions ≈ 2–3 × total executor cores` and size
  * `spark.sql.files.maxPartitionBytes` so scan tasks land at 128–256 MB.
  * AQE stays on: it re-coalesces post-shuffle partitions and splits skewed
  * join partitions at runtime, which is exactly what variable real-world
  * key distributions need at 100 TB.
  */
object GraftSession {
  def builder(
      master: String = "local[*]",
      appName: String = "graft",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts parquet type handling; see Tables.readerConfs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
