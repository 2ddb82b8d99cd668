package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2.5).
  *
  * All scoring is arithmetic over token streams, expressed with Catalyst
  * higher-order functions (no UDFs) and re-expressed identically in DuckDB
  * for the oracle. Scale: every operator is a single narrow projection over
  * the corpus — embarrassingly parallel, no shuffle at all (the ORDER BY is
  * only for deterministic oracle comparison).
  */
object TextOps {

  /** Shared stopword list — Curation reuses it so the flagship gate can't
    * drift from the verified t2 operator. */
  val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  private val stopSql = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The t2 composite quality score as a reusable Column over `text`. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopCount = size(filter(toks, t =>
      t.isin(stopwords.map(x => x: Any): _*))).cast("double")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double")
    round((stopCount / nTok) * 0.5 +
      least(sumLen / nTok / lit(8.0), lit(1.0)) * 0.5, 6)
  }

  // ---------------------------------------------------------------- t1
  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars).
    */
  def t1TokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("([a-z]+|[0-9]+|[^a-z0-9 ])"), lit(1)))
          .as("n_bpe_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))

  val t1Sql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '([a-z]+|[0-9]+|[^a-z0-9 ])', 1)) AS INT) AS n_bpe_tokens,
      |  CAST(length(text) AS INT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t2
  /** Quality scoring: stopword ratio, mean word length, punctuation ratio,
    * and a fixed-weight composite — double arithmetic identical on both
    * engines, rounded at 6.
    */
  def t2QualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopCount = size(filter(toks, t =>
      t.isin(stopwords.map(x => x: Any): _*))).cast("double")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double")
    val punct = length(col("text")) -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        round(stopCount / nTok, 6).as("stop_ratio"),
        round(sumLen / nTok, 6).as("avg_word_len"),
        round(punct.cast("double") / length(col("text")), 6).as("punct_ratio"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  val t2Sql: String =
    s"""SELECT doc_id,
      |  round(stop_n / n_tok, 6) AS stop_ratio,
      |  round(sum_len / n_tok, 6) AS avg_word_len,
      |  round(punct_n / nchars, 6) AS punct_ratio,
      |  round((stop_n / n_tok) * 0.5 + least(sum_len / n_tok / 8.0, 1.0) * 0.5, 6) AS quality
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
      |    CAST(len(list_filter(string_split(text, ' '), t -> t IN $stopSql)) AS DOUBLE) AS stop_n,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT))),
      |      (a, x) -> a + x) AS DOUBLE) AS sum_len,
      |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS punct_n,
      |    CAST(length(text) AS DOUBLE) AS nchars
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t3
  /** Marker-word language-ID heuristic: count per-language marker tokens,
    * argmax with a fixed precedence tiebreak, compared against the labeled
    * `lang`. (The synthetic corpus is English-ish word salad for every
    * label, so `agree` is mostly false — the point is the deterministic
    * scoring pipeline, not model quality.)
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "que"),
    "fr" -> Seq("le", "les", "une", "est"),
    "zh" -> Seq("de", "shi", "zai", "le"))

  def t3LangId(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokens(col("text"))
    def score(ws: Seq[String]): Column =
      size(filter(toks, t => t.isin(ws.map(x => x: Any): _*))).cast("long")
    val scored = markers.foldLeft(Tables(spark, sfDir, "documents")) {
      case (df, (l, ws)) => df.withColumn(s"score_$l", score(ws))
    }
    // argmax with precedence = declaration order (en > de > es > fr > zh)
    val pred = markers.map(_._1).foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"score_$l") === greatest(markers.map(m => col(s"score_${m._1}")): _*)
        && col(s"score_$l") > 0, lit(l)).otherwise(acc)
    }
    scored
      .select(Seq(col("doc_id"), col("lang")) ++
        markers.map(m => col(s"score_${m._1}")) :+ pred.as("pred"): _*)
      .withColumn("agree", (col("pred") === col("lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  val t3Sql: String = {
    val scoreExprs = markers.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString("(", ", ", ")")
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN $set)) AS BIGINT) AS score_$l"
    }.mkString(",\n    ")
    val gl = markers.map(m => s"score_${m._1}").mkString("greatest(", ", ", ")")
    val caseExpr = markers.map { case (l, _) =>
      s"WHEN score_$l = $gl AND score_$l > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
      |  pred, CAST(pred = lang AS INT) AS agree
      |FROM (
      |  SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
      |    $caseExpr AS pred
      |  FROM (
      |    SELECT doc_id, lang,
      |    $scoreExprs
      |    FROM documents))
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t4
  /** Document fingerprinting: full-text rolling polynomial hash plus the
    * minimum shingle hash (a 1-element winnowing fingerprint).
    */
  def t4Fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        charFoldHash(col("text")).as("fp"),
        array_min(shingleHashes(col("text"))).as("min_shingle"))
      .orderBy(col("doc_id"))

  val t4Sql: String = {
    val ths = sqlTokenHashes("text")
    s"""SELECT doc_id,
      |  ${sqlCharFold("text")} AS fp,
      |  list_min(${sqlShingles("ths")}) AS min_shingle
      |FROM (SELECT doc_id, text, $ths AS ths FROM documents)
      |ORDER BY doc_id""".stripMargin
  }


  // ---------------------------------------------------------------- t5
  /** Unigram surprisal scoring — a language-model-ish quality signal:
    * build corpus-wide token frequencies (pass 1), then score each doc by
    * the mean negative log-probability of its tokens (pass 2, a join from
    * exploded tokens back to the frequency table). Common-word documents
    * score low, rare-token soup scores high.
    * 100 TB: the frequency table is |vocab| rows. Natural-language vocab
    * grows sublinearly (Heaps' law, |V| ≈ K·N^0.5): ~10⁷ distinct tokens
    * per TB of text → tens of MB of (token, logp) — broadcastable, and a
    * production run caps it anyway (frequency floor / top-M vocab with an
    * OOV bucket), which hard-bounds the broadcast. Broadcasting freqs is
    * load-bearing: it keeps the exploded token stream from re-shuffling on
    * token before its final groupBy(doc_id).
    * Parity: ln/exp noise is ~1e-16 per term; round(4) absorbs it.
    */
  def t5Surprisal(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    // corpus total as a 1-row aggregate cross-joined in — keeps the whole
    // operator one lazy plan (no driver-side count during construction)
    val totals = toks.agg(count(lit(1)).cast("double").as("total"))
    val freqs = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"))
      .crossJoin(broadcast(totals))
      .withColumn("logp", log(col("tf") / col("total")))
      .select(col("token"), col("logp"))
    toks.join(broadcast(freqs), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(col("logp")) / count(lit(1)), 4).as("surprisal"))
      .orderBy(col("doc_id"))
  }

  val t5Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |freqs AS (SELECT token, ln(count(*) / (SELECT count(*)::DOUBLE FROM toks)) AS logp
      |          FROM toks GROUP BY token)
      |SELECT doc_id, count(*) AS n_tokens,
      |  round(-sum(logp) / count(*), 4) AS surprisal
      |FROM toks JOIN freqs USING (token)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_token_count" -> (t1TokenCount _),
    "t2_quality_score" -> (t2QualityScore _),
    "t3_langid" -> (t3LangId _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_surprisal" -> (t5Surprisal _))

  val sql: Map[String, String] = Map(
    "t1_token_count" -> t1Sql,
    "t2_quality_score" -> t2Sql,
    "t3_langid" -> t3Sql,
    "t4_fingerprint" -> t4Sql,
    "t5_surprisal" -> t5Sql)
}
