package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * end-to-end corpus-curation pipeline — exact dedup → near-dup drop →
    * quality gate → annotation (see graft.ops.Curation).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Curation.curate(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ text.TextOps.all ++ dedup.Dedup.all ++
      similarity.Similarity.all ++ multimodal.Multimodal.all ++
      streaming.EventStreams.all ++ pipeline.PipelineQueries.all ++
      ops.Sampling.all ++ ops.Graph.all ++
      Map("st8_curated_mix" ->
        ((s: SparkSession, d: String) => ops.Curation.st8CuratedMix(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.sql ++ text.TextOps.sql ++ dedup.Dedup.sql ++
      similarity.Similarity.sql ++ multimodal.Multimodal.sql ++
      streaming.EventStreams.sql ++ pipeline.PipelineQueries.sql ++
      ops.Sampling.sql ++ ops.Graph.sql ++
      Map("st8_curated_mix" -> ops.Curation.st8Sql)
}
