package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._

/** Data-mixing / sampling operators (SURVEY.md §2.5b extension).
  *
  * Training-data pipelines mix sources at controlled rates ("sampling
  * weights"). The scalable primitive is DETERMINISTIC hash-based sampling:
  * keep a row iff hash(source, id) mod 100 < rate(source). No RNG state, no
  * seed plumbing, exactly reproducible across engines/runs/retries, and a
  * pure map-side filter — the filter runs inside the scan stage at any
  * scale. The per-source rate here is a pure function of the source name so
  * the DuckDB oracle rebuilds it; production swaps in a broadcast rate map.
  */
object Sampling {

  /** a4: per-source stratified sample at rate (20 + 3·K)% for srcK. */
  def a4StratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rate = lit(20) + lit(3) * substring(col("source"), 4, 10).cast("int")
    val key = charFoldHash(
      concat(col("source"), lit("#"), col("doc_id").cast("string")))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rate", rate)
      .filter(key % 100 < col("rate"))
      .orderBy(col("doc_id"))
  }

  val a4Sql: String = {
    val key = sqlCharFold("source || '#' || CAST(doc_id AS VARCHAR)")
    """SELECT doc_id, source, rate FROM (
      |  SELECT doc_id, source,
      |    20 + 3 * CAST(substr(source, 4) AS INT) AS rate,
      |    KEYEXPR % 100 AS bucket
      |  FROM documents)
      |WHERE bucket < rate
      |ORDER BY doc_id""".stripMargin.replace("KEYEXPR", key)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a4_stratified_sample" -> (a4StratifiedSample _))

  val sql: Map[String, String] = Map(
    "a4_stratified_sample" -> a4Sql)
}
