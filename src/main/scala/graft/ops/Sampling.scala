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

  /** a4: per-source stratified sample at rate (20 + 3·K)% for srcK.
    * The keep decision uses [[graft.functions.hashBucket]] (scrambled
    * fold) — the raw fold is non-uniform mod 100 over `src#id` keys with
    * sequential ids, which skews realized rates by tens of percent.
    */
  def a4StratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rate = lit(20) + lit(3) * substring(col("source"), 4, 10).cast("int")
    val key = hashBucket(
      concat(col("source"), lit("#"), col("doc_id").cast("string")), 100)
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rate", rate)
      .filter(key < col("rate"))
      .orderBy(col("doc_id"))
  }

  val a4Sql: String = {
    val key = sqlHashBucket("source || '#' || CAST(doc_id AS VARCHAR)", 100)
    """SELECT doc_id, source, rate FROM (
      |  SELECT doc_id, source,
      |    20 + 3 * CAST(substr(source, 4) AS INT) AS rate,
      |    KEYEXPR AS bucket
      |  FROM documents)
      |WHERE bucket < rate
      |ORDER BY doc_id""".stripMargin.replace("KEYEXPR", key)
  }

  /** a5: temperature-based language mixing — the multilingual-rebalance
    * primitive (sample stratum s at a rate ∝ n_s^(α−1), α = 1/2, so
    * post-sample shares flatten toward n_s^α). Downsampling-only form:
    * rate_s = √(n_min / n_s) scaled to integer per-mille, so the smallest
    * stratum keeps everything and the dominant one is thinned hardest.
    * 100 TB: stratum counts are one partial-aggregated pass (|langs| rows,
    * a model-scale broadcast); the keep decision is then the same
    * deterministic map-side hash filter as a4 — no RNG state, reproducible
    * across runs/retries, and the filter runs inside the scan stage.
    * Parity: the only float op is √ of a BIGINT ratio — IEEE-exact on both
    * engines; floor to per-mille before the integer compare.
    */
  def a5TemperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang").as("cl")).agg(count(lit(1)).as("n"))
    // |langs| rows — bounded by the language inventory at any SF
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n")).as("n_min"))))
      .select(col("cl"),
        floor(lit(1000) * sqrt(col("n_min").cast("double") / col("n")))
          .cast("int").as("rate_permille"))
    val key = hashBucket(concat(col("lang"), lit("#"), col("doc_id").cast("string")), 1000)
    docs.join(broadcast(rates), col("lang") === col("cl"))
      .filter(key < col("rate_permille"))
      .select(col("doc_id"), col("lang"), col("rate_permille"))
      .orderBy(col("doc_id"))
  }

  val a5Sql: String = {
    val key = sqlHashBucket("lang || '#' || CAST(doc_id AS VARCHAR)", 1000)
    """WITH counts AS (SELECT lang AS cl, count(*) AS n FROM documents GROUP BY lang),
      |rates AS (
      |  SELECT cl, CAST(floor(1000 * sqrt(CAST((SELECT min(n) FROM counts) AS DOUBLE) / n)) AS INT)
      |    AS rate_permille
      |  FROM counts)
      |SELECT doc_id, lang, rate_permille
      |FROM documents JOIN rates ON lang = cl
      |WHERE KEYEXPR < rate_permille
      |ORDER BY doc_id""".stripMargin.replace("KEYEXPR", key)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a4_stratified_sample" -> (a4StratifiedSample _),
    "a5_temperature_mix" -> (a5TemperatureMix _))

  val sql: Map[String, String] = Map(
    "a4_stratified_sample" -> a4Sql,
    "a5_temperature_mix" -> a5Sql)
}
