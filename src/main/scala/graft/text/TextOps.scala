package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.ops.Pin.Pinned

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
        // both counts ride the Tokenizer seam (native overrides — no UDF)
        WhitespaceTokenizer.countCol(col("text")).cast("int")
          .as("n_ws_tokens"),
        RegexBpeTokenizer.countCol(col("text")).cast("int")
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

  /** DuckDB twin of [[graft.ops.Curation.rowGates]]: the gated `documents`
    * rows (quality ≥ 0.3 AND duplicate-3-gram fraction < 0.5) as a
    * complete SELECT, for oracles that need the flagship's row gates as a
    * building block (st8). quality is t2's rounded composite; rep3 is
    * t6's UNROUNDED ratio — both formulas char-for-char the ones the t2/t6
    * oracles already prove portable.
    */
  val sqlGatedDocs: String = {
    val ths = graft.functions.sqlTokenHashes("text")
    s"""SELECT doc_id, lang, source, text FROM (
      |  SELECT doc_id, lang, source, text,
      |    round((stop_n / n_tok) * 0.5 + least(sum_len / n_tok / 8.0, 1.0) * 0.5, 6) AS quality,
      |    CASE WHEN len(ths) >= 3 THEN 1.0 -
      |      CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END AS rep3
      |  FROM (
      |    SELECT doc_id, lang, source, text, ths,
      |      [((ths[k+1] * $ShingleBase + ths[k+2]) % $P * $ShingleBase + ths[k+3]) % $P
      |       for k in range(len(ths) - 2)] AS g3,
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
      |      CAST(len(list_filter(string_split(text, ' '), t -> t IN $stopSql)) AS DOUBLE) AS stop_n,
      |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT))),
      |        (a, x) -> a + x) AS DOUBLE) AS sum_len
      |    FROM (SELECT doc_id, lang, source, text, $ths AS ths FROM documents)))
      |WHERE quality >= 0.3 AND rep3 < 0.5""".stripMargin
  }

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

  // ---------------------------------------------------------------- t17
  /** Held-out BIGRAM LM scoring with Stupid Backoff (Brants et al. 2007)
    * — the CCNet-style quality gate t5 approximates with unigrams: train
    * an n-gram LM on a REFERENCE partition (even doc_ids — in production,
    * the trusted corpus), score the candidate partition (odd doc_ids) by
    * mean negative log-score. S(w₂|w₁) = c(w₁w₂)/c(w₁) when the bigram
    * was seen, else backoff α·(c(w₂)+1)/(N+V) (add-one smoothed unigram —
    * candidate docs genuinely contain tokens and bigrams the reference
    * never saw, which is exactly what the backoff branch is for and why
    * the LM must NOT train on the scored docs: self-trained, every bigram
    * is seen and the score degenerates to t5's shape). Fluent text scores
    * low, rare-construction soup scores high.
    * 100 TB: the unigram table is Heaps-law bounded (t5's argument) and
    * broadcasts; the BIGRAM table is quadratically bigger and does NOT —
    * the candidate bigram stream joins it with a plain (w₁,w₂)-keyed
    * shuffle join (AQE may still broadcast at small scale; the plan shape
    * stays valid when it can't). A production run caps the bigram vocab
    * by frequency floor, which this plan inherits by filtering `big`.
    * Parity: counts are exact integers; each term is one division (+ one
    * multiply on the backoff branch) in identical operand order; round(4)
    * absorbs ln noise over the per-doc sum (t5's argument).
    */
  val LmBackoffAlpha = 0.4

  def t17LmScore(spark: SparkSession, sfDir: String): DataFrame =
    t17Of(Tables(spark, sfDir, "documents"))

  private[graft] def t17Of(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"), tokens(col("text")).as("t"))
    def bigrams(d: DataFrame): DataFrame = d
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val tst = docs.filter(col("doc_id") % 2 === 1)
    val uni = ref.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val tot = uni.agg(sum(col("cw")).as("nn"), count(lit(1)).as("vv"))
    val big = bigrams(ref).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    bigrams(tst)
      .join(big, Seq("w1", "w2"), "left")
      .join(broadcast(uni.select(col("w").as("w1"), col("cw").as("c1"))),
        Seq("w1"), "left")
      .join(broadcast(uni.select(col("w").as("w2"), col("cw").as("cw2"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("s", when(col("c2").isNotNull,
          col("c2").cast("double") / col("c1").cast("double"))
        .otherwise(lit(LmBackoffAlpha) * (coalesce(col("cw2"), lit(0L)) + 1) /
          (col("nn") + col("vv")).cast("double")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(log(col("s"))) / count(lit(1)), 4).as("lm_score"))
      .orderBy(col("doc_id"))
  }

  val t17Sql: String =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM (
      |    SELECT unnest(t) AS w FROM docs WHERE doc_id % 2 = 0) GROUP BY w),
      |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS nn,
      |               CAST(count(*) AS BIGINT) AS vv FROM uni),
      |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM (
      |    SELECT t[i+1] AS w1, t[i+2] AS w2 FROM (
      |      SELECT t, unnest(range(len(t) - 1)) AS i
      |      FROM docs WHERE doc_id % 2 = 0 AND len(t) >= 2))
      |  GROUP BY w1, w2),
      |tstb AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2 FROM (
      |    SELECT doc_id, t, unnest(range(len(t) - 1)) AS i
      |    FROM docs WHERE doc_id % 2 = 1 AND len(t) >= 2)),
      |scored AS (
      |  SELECT s.doc_id,
      |    CASE WHEN b.c2 IS NOT NULL
      |         THEN CAST(b.c2 AS DOUBLE) / CAST(u1.cw AS DOUBLE)
      |         ELSE $LmBackoffAlpha * (coalesce(u2.cw, 0) + 1) /
      |              CAST((SELECT nn FROM tot) + (SELECT vv FROM tot) AS DOUBLE)
      |    END AS sc
      |  FROM tstb s
      |  LEFT JOIN big b ON s.w1 = b.w1 AND s.w2 = b.w2
      |  LEFT JOIN uni u1 ON s.w1 = u1.w
      |  LEFT JOIN uni u2 ON s.w2 = u2.w)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(-sum(ln(sc)) / count(*), 4) AS lm_score
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t18
  /** Deterministic text NORMALIZATION — the preprocessing pass every
    * pipeline runs before hashing/dedup (d1's exact dedup is only as good
    * as its canonical form: "Hello,  world." and "hello world" should
    * collide): lowercase → strip sentence punctuation → collapse runs of
    * spaces → trim. Emitted as accounting + the md5 of the normalized
    * text, so the canonical form itself is oracle-certified, and the
    * composition with d1 is just `md5(normalize(text))`. IDEMPOTENT by
    * construction (each stage's output is a fixpoint of itself —
    * spec-asserted by double application). All four stages are engine
    * built-ins (lower / regexp_replace / trim) evaluated identically by
    * DuckDB's RE2 — no UDF, whole-stage codegen, zero shuffle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,!?;:]", ""), " +", " "))

  def t18Normalize(spark: SparkSession, sfDir: String): DataFrame =
    t18Of(Tables(spark, sfDir, "documents"))

  private[graft] def t18Of(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        length(normalizeText(col("text"))).as("n_chars_norm"),
        (normalizeText(col("text")) =!= col("text")).cast("int").as("changed"),
        md5(normalizeText(col("text")).cast("binary")).as("norm_fp"))
      .orderBy(col("doc_id"))

  val t18Sql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS INT) AS n_chars,
      |  CAST(length(norm) AS INT) AS n_chars_norm,
      |  CAST(norm <> text AS INT) AS changed,
      |  md5(norm) AS norm_fp
      |FROM (
      |  SELECT doc_id, text,
      |    trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
      |         ' +', ' ', 'g')) AS norm
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t6
  /** Repetition signals (the Gopher/MassiveText-style repetition filters):
    * type-token ratio plus duplicate word-2-gram and word-3-gram fractions.
    * Highly repetitive machine-generated text scores high on rep_n and low
    * on ttr. One narrow projection per doc; the k-gram arrays combine the
    * portable token hashes WITH multiplicity (unlike the deduped shingle
    * machinery), since multiplicity is exactly what repetition measures.
    */
  def t6Repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val th = tokenHashes(col("text"))
    val nTok = size(th)
    def gram2 = transform(sequence(lit(0), nTok - 2), k =>
      (element_at(th, k + 1) * ShingleBase + element_at(th, k + 2)) % P)
    def gram3 = transform(sequence(lit(0), nTok - 3), k =>
      ((element_at(th, k + 1) * ShingleBase + element_at(th, k + 2)) % P
        * ShingleBase + element_at(th, k + 3)) % P)
    def repFrac(g: Column): Column =
      round(lit(1.0) - size(array_distinct(g)).cast("double")
        / size(g).cast("double"), 6)
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), th.as("th"), nTok.as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(size(array_distinct(col("th"))).cast("double")
          / col("n_tokens").cast("double"), 6).as("ttr"),
        when(col("n_tokens") >= 2, repFrac(gram2)).otherwise(0.0).as("rep2"),
        when(col("n_tokens") >= 3, repFrac(gram3)).otherwise(0.0).as("rep3"))
      .orderBy(col("doc_id"))
  }

  val t6Sql: String = {
    val ths = sqlTokenHashes("text")
    s"""SELECT doc_id, CAST(len(ths) AS INT) AS n_tokens,
      |  round(CAST(len(list_distinct(ths)) AS DOUBLE) / len(ths), 6) AS ttr,
      |  CASE WHEN len(ths) >= 2 THEN round(1.0 -
      |    CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) ELSE 0.0 END AS rep2,
      |  CASE WHEN len(ths) >= 3 THEN round(1.0 -
      |    CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) ELSE 0.0 END AS rep3
      |FROM (
      |  SELECT doc_id, ths,
      |    [(ths[k+1] * $ShingleBase + ths[k+2]) % $P
      |     for k in range(len(ths) - 1)] AS g2,
      |    [((ths[k+1] * $ShingleBase + ths[k+2]) % $P * $ShingleBase + ths[k+3]) % $P
      |     for k in range(len(ths) - 2)] AS g3
      |  FROM (SELECT doc_id, $ths AS ths FROM documents))
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t7
  /** Gopher-style rule gate: hard quality rules as independent flags plus
    * the conjunction — word count bounds, mean word length bounds, minimum
    * alphabetic-token fraction, minimum stopword hits. Flags are kept
    * per-rule (ints) so downstream mixing can weight them; one narrow
    * projection, no shuffle.
    */
  def t7GopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
      .cast("double") / nTok
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nTok
    val stopHits = size(filter(toks, t =>
      t.isin(stopwords.map(x => x: Any): _*)))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        (size(toks) >= 50 && size(toks) <= 500).cast("int").as("wc_ok"),
        (meanLen >= 3.0 && meanLen <= 10.0).cast("int").as("len_ok"),
        (alphaFrac >= 0.8).cast("int").as("alpha_ok"),
        (stopHits >= 2).cast("int").as("stop_ok"))
      .withColumn("pass",
        (col("wc_ok") === 1 && col("len_ok") === 1 &&
          col("alpha_ok") === 1 && col("stop_ok") === 1).cast("int"))
      .orderBy(col("doc_id"))
  }

  val t7Sql: String =
    s"""SELECT doc_id, wc_ok, len_ok, alpha_ok, stop_ok,
      |  CAST(wc_ok = 1 AND len_ok = 1 AND alpha_ok = 1 AND stop_ok = 1 AS INT) AS pass
      |FROM (
      |  SELECT doc_id,
      |    CAST(n_tok >= 50 AND n_tok <= 500 AS INT) AS wc_ok,
      |    CAST(sum_len / n_tok >= 3.0 AND sum_len / n_tok <= 10.0 AS INT) AS len_ok,
      |    CAST(alpha_n / n_tok >= 0.8 AS INT) AS alpha_ok,
      |    CAST(stop_n >= 2 AS INT) AS stop_ok
      |  FROM (
      |    SELECT doc_id,
      |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
      |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT))),
      |        (a, x) -> a + x) AS DOUBLE) AS sum_len,
      |      CAST(len(list_filter(string_split(text, ' '),
      |        t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) AS alpha_n,
      |      len(list_filter(string_split(text, ' '), t -> t IN $stopSql)) AS stop_n
      |    FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t8
  /** PII detection + redaction. The synthetic corpus carries no PII, so the
    * operator first builds a deterministic augmented text (every 3rd doc
    * gains an email, every 5th an IPv4, every 7th a phone number — both
    * engines construct the identical string), then counts and redacts with
    * dialect-portable regexes (no backrefs, no lookaround — Java and RE2
    * agree). The redacted text is fingerprinted with the portable char fold
    * so the oracle verifies the FULL redacted string, not just counts.
    * Scale: narrow projection, regex state machines stream per row.
    */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def t8PiiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val aug = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" host 192.168."), (col("doc_id") % 250).cast("string"),
          lit(".7"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(" call 555-867-5309")).otherwise(lit("")))
    val redacted = regexp_replace(
      regexp_replace(regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")
    Tables(spark, sfDir, "documents")
      .withColumn("aug", aug)
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(col("aug"), lit(Ipv4Re)).cast("int").as("n_ips"),
        regexp_count(col("aug"), lit(PhoneRe)).cast("int").as("n_phones"),
        charFoldHash(redacted).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  val t8Sql: String = {
    val aug = "text || " +
      "(CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) || " +
      "(CASE WHEN doc_id % 5 = 0 THEN ' host 192.168.' || CAST(doc_id % 250 AS VARCHAR) || '.7' ELSE '' END) || " +
      "(CASE WHEN doc_id % 7 = 0 THEN ' call 555-867-5309' ELSE '' END)"
    val redacted = s"regexp_replace(regexp_replace(regexp_replace(aug, " +
      s"'$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(aug, '$EmailRe')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(aug, '$Ipv4Re')) AS INT) AS n_ips,
      |  CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS INT) AS n_phones,
      |  ${sqlCharFold(redacted)} AS redacted_fp
      |FROM (SELECT doc_id, $aug AS aug FROM documents)
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t9
  /** Benchmark-contamination check: shared word-3-gram shingles between
    * each document and a "benchmark" set (every 97th doc stands in for the
    * eval suite). Per doc: how many of its distinct shingles appear
    * anywhere in the benchmark, and a contaminated flag.
    * 100 TB: benchmark suites are BOUNDED (fixed eval sets) — their distinct
    * shingles broadcast; the corpus streams through one semi-join + count,
    * no pair space.
    */
  def t9Contamination(spark: SparkSession, sfDir: String): DataFrame =
    t9FromShingles(Tables(spark, sfDir, "documents")
      .select(col("doc_id"), shingleHashes(col("text")).as("sh"))
      .pin()) // shingles compute once for both roles
      .orderBy(col("doc_id"))

  /** t9's core on a prebuilt (doc_id, sh) shingle frame — the input must
    * already be materialized (both the benchmark and corpus roles read it).
    * Returns UNORDERED (doc_id, n_shared, contaminated).
    */
  private[graft] def t9FromShingles(docs: DataFrame): DataFrame = {
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("bsh")).distinct()
    val shared = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .join(broadcast(bench), col("s") === col("bsh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // sh is distinct per doc already
    docs.select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
  }

  val t9Sql: String = {
    val ths = sqlTokenHashes("text")
    val docsSub = s"SELECT doc_id, ${sqlShingles("ths")} AS sh " +
      s"FROM (SELECT doc_id, $ths AS ths FROM documents)"
    s"""WITH sh AS (SELECT doc_id, unnest(sh) AS s FROM ($docsSub)),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
      |shared AS (SELECT doc_id, count(*) AS n_shared FROM sh
      |           WHERE s IN (SELECT s FROM bench) GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(shared.n_shared, 0) AS BIGINT) AS n_shared,
      |  CAST(coalesce(shared.n_shared, 0) > 0 AS INT) AS contaminated
      |FROM (SELECT doc_id FROM documents) d
      |LEFT JOIN shared ON d.doc_id = shared.doc_id
      |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t10
  /** Fixed-window chunking: split each document into consecutive 32-token
    * chunks (the pretraining tokenize-and-split step). Each chunk carries
    * its token count and a portable fingerprint of its text, so the oracle
    * verifies the exact chunk CONTENT, not just the arithmetic.
    * 100 TB: explode(sequence) is a generator inside the scan stage — rows
    * fan out map-side, no shuffle (the ORDER BY is oracle determinism).
    */
  val ChunkTokens = 32

  def t10Chunking(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nChunks = ceil(size(toks).cast("double") / ChunkTokens).cast("int")
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), toks.as("t"), nChunks.as("nc"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), col("nc") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("t"), col("chunk_id") * ChunkTokens + 1, lit(ChunkTokens)).as("ct"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ct")).as("n_chunk_tokens"),
        charFoldHash(array_join(col("ct"), " ")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val t10Sql: String =
    s"""SELECT doc_id, chunk_id,
      |  CAST(len(ct) AS INT) AS n_chunk_tokens,
      |  ${sqlCharFold("array_to_string(ct, ' ')")} AS chunk_fp
      |FROM (
      |  SELECT doc_id, c AS chunk_id,
      |    list_slice(t, c * $ChunkTokens + 1, c * $ChunkTokens + $ChunkTokens) AS ct
      |  FROM (
      |    SELECT doc_id, t,
      |      unnest(range(CAST(ceil(len(t) / ${ChunkTokens}.0) AS INT))) AS c
      |    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)))
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------- t11
  /** Sequence packing: assign documents (in deterministic doc_id order,
    * per source) to fixed-token-budget bins by cumulative token offset —
    * the distributed approximation of greedy context-window packing. A
    * doc's bin is floor(start_offset / budget), so bins fill in order and
    * the assignment is one window over the per-source ordering.
    * 100 TB: ONE shuffle by source; within-source packing is a running sum.
    * A pathologically hot source is split by a secondary key (e.g. day) in
    * production — the bin id stays deterministic either way.
    */
  val PackBudget = 256

  def t11SeqPacking(spark: SparkSession, sfDir: String): DataFrame =
    t11SeqPackingWith(spark, sfDir, WhitespaceTokenizer)

  /** [[t11SeqPacking]] under an injected [[Tokenizer]] — the packing
    * window/bin arithmetic is tokenizer-agnostic; only the count column
    * changes (`TokenizerSpec`).
    */
  def t11SeqPackingWith(spark: SparkSession, sfDir: String,
      tok: Tokenizer): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        tok.countCol(col("text")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast("double") / PackBudget)
          .cast("bigint").as("bin"))
      .orderBy(col("doc_id"))
  }

  val t11Sql: String =
    s"""SELECT doc_id, source, n_tokens,
      |  CAST(floor((cum - n_tokens) / ${PackBudget}.0) AS BIGINT) AS bin
      |FROM (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM (SELECT doc_id, source,
      |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t12
  /** Corpus-frequency boilerplate removal — the C4 rule proper: any
    * [[graft.dedup.Dedup.SegTokens]]-token segment appearing in
    * [[BoilerplateMinDocs]] or more DISTINCT documents is boilerplate
    * (navigation chrome, license banners, cookie notices) and is removed
    * from EVERY document, including the first. Complements d9, which keeps
    * one owner per repeated segment; here repetition across ≥3 docs is
    * evidence the segment is template noise, not content.
    * 100 TB: doc-frequency pass groups md5(segment) after an id-level
    * distinct (32-char keys, no payloads); the boilerplate set is a tiny
    * fraction of the corpus, so the removal anti-join broadcasts (AQE picks
    * that up; a runtime bloom filter serves the same role at cluster scale).
    * Reassembly is the one payload-carrying shuffle, volume ≤ corpus.
    */
  val BoilerplateMinDocs = 3

  def t12Boilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val segs = graft.dedup.Dedup.segments(spark, sfDir)
    val boiler = segs
      .select(col("doc_id"), md5(col("seg").cast("binary")).as("h"))
      .distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= BoilerplateMinDocs)
      .select(col("h"))
    segs.join(boiler, md5(col("seg").cast("binary")) === col("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(max(col("n_seg_total")).as("n_seg_total"),
        count(lit(1)).as("n_seg_kept"),
        charFoldHash(array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg")), " ")).as("text_fp"))
      .orderBy(col("doc_id"))
  }

  val t12Sql: String =
    s"""WITH segs AS (
      |  ${graft.dedup.Dedup.segmentsSql}),
      |boiler AS (
      |  SELECT h FROM (
      |    SELECT h, count(*) AS nd
      |    FROM (SELECT DISTINCT doc_id, md5(seg) AS h FROM segs)
      |    GROUP BY h)
      |  WHERE nd >= $BoilerplateMinDocs)
      |SELECT doc_id, max(n_seg_total) AS n_seg_total, count(*) AS n_seg_kept,
      |  ${sqlCharFold("string_agg(seg, ' ' ORDER BY seg_idx)")} AS text_fp
      |FROM segs WHERE md5(seg) NOT IN (SELECT h FROM boiler)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t13
  /** BM25 keyword retrieval — the lexical index half of a retrieval
    * pipeline (hybrid search pairs it with s1/s7's dense half): score
    * every document against a query term set by the Okapi BM25 weight
    *   idf(t)·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
    * and return the top 20. Term statistics (df per term, corpus N and
    * avgdl) are computed in-plan — no driver-side pass.
    * 100 TB: the exploded token stream filters to the query terms AT THE
    * SCAN (a production system materializes the inverted index once; the
    * per-query plan here IS the posting-list scan: |docs containing t|
    * rows, not |corpus tokens|); df and the 1-row (N, avgdl) broadcast;
    * the per-doc sum shuffles only matching (doc, term) pairs — O(Σ df).
    * Parity: ln noise ~1e-16 absorbed by round(4) (t5's precedent);
    * constants written as identical literals both sides; dl sums are
    * integer-valued doubles (exact in any fold order).
    */
  val Bm25Terms = Seq("dup", "hash", "window")

  def t13Bm25Search(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(col("token").isin(Bm25Terms.map(x => x: Any): _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dft), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w", col("idf") * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 4).as("bm25"),
        count(lit(1)).cast("int").as("n_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  val t13Sql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH dl AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
      |  FROM documents),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token IN $terms GROUP BY 1, 2),
      |dft AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
      |SELECT doc_id,
      |  round(sum(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25,
      |  CAST(count(*) AS INT) AS n_terms
      |FROM (
      |  SELECT tf.doc_id, tf.tf, l.dl, s.n_docs, s.avgdl,
      |    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf
      |  FROM tf JOIN dft d USING (token)
      |  JOIN dl l ON l.doc_id = tf.doc_id
      |  CROSS JOIN stats s)
      |GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id
      |LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- t14
  /** Corpus collocations by pointwise mutual information — the corpus
    * statistic behind phrase mining / tokenizer-merge candidates: bigrams
    * whose co-occurrence beats the unigram-independence expectation,
    * PMI = ln(p(ab) / (p(a)·p(b))), reported for every bigram with
    * count ≥ [[T14MinCount]].
    *
    * Determinism: the cut is the INTEGER count floor, never a float-ranked
    * top-k (a PMI-ordered LIMIT would tie-break on ln ulps and flap
    * between engines); the PMI folds to one ratio —
    * (c_ab·N²) / (NB·c_a·c_b) — before the single divide+ln. Both factors
    * are computed in DOUBLES with identical left-associated multiply order
    * on both engines (an all-integer fold would overflow Long silently in
    * Spark / hard in DuckDB once N > ~3e9 tokens — a real corpus size);
    * IEEE multiply is deterministic, and round(4) absorbs the ln ulp.
    * The trailing `+ 0.0` canonicalizes the signed zero: round(−ε, 4) is
    * −0.0 in DuckDB but +0.0 in Spark (BigDecimal HALF_UP has no signed
    * zero), and the two differ in the hash gate's bit compare; IEEE
    * −0.0 + 0.0 = +0.0 makes both engines agree.
    * 100 TB: bigram counts partial-aggregate map-side before one shuffle
    * on the pair; Zipf + the count floor keep the survivor table tiny
    * (vocab² never materializes — only observed adjacent pairs); the
    * unigram vocab table broadcasts (t5's Heaps-law bound).
    */
  val T14MinCount = 5

  def t14Collocations(spark: SparkSession, sfDir: String): DataFrame = {
    val ts = tokens(col("text"))
    // widen before the token/bigram explodes (×~200 rows/doc with struct
    // payloads — measured as one 2.7 s task at sf0.1; see [[widen]])
    val docs = widen(Tables(spark, sfDir, "documents").select(col("text")))
    val uni = docs.select(explode(ts).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .pin() // feeds c1, c2 AND the n total — build once
    // sequence(1, n-1) DESCENDS when n = 1 (Spark generates backwards
    // sequences) — guard 1-token docs to an empty bigram list
    val pairCounts = docs.select(explode(when(size(ts) >= 2, transform(
        sequence(lit(1), size(ts) - 1),
        k => struct(element_at(ts, k).as("w1"), element_at(ts, k + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
      .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .pin() // feeds the survivors AND the nb total
    // totals fold from the AGGREGATED tables (sums of counts are exact),
    // so documents scans twice — not four times — and the totals aggs run
    // over |vocab| rows, not the 5M-row token/bigram streams
    val totals = uni.agg(sum(col("c")).as("n"))
      .crossJoin(pairCounts.agg(sum(col("n_pair")).as("nb")))
    pairCounts
      .filter(col("n_pair") >= T14MinCount)
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_pair"),
        (round(log((col("n_pair").cast("double") * col("n") * col("n")) /
          (col("nb").cast("double") * col("c1") * col("c2"))), 4) + lit(0.0)).as("pmi"))
      .orderBy(col("w1"), col("w2"))
  }

  val t14Sql: String =
    s"""WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
      |uni AS (SELECT w, count(*) AS c
      |        FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w),
      |big AS (SELECT unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
      |        FROM toks),
      |pairs AS (SELECT w1, w2, count(*) AS n_pair FROM big GROUP BY w1, w2
      |          HAVING count(*) >= $T14MinCount),
      |tot AS (SELECT (SELECT count(*) FROM (SELECT unnest(ts) FROM toks)) AS n,
      |               (SELECT count(*) FROM big) AS nb)
      |SELECT w1, w2, n_pair,
      |  round(ln((n_pair::DOUBLE * n * n) / (nb::DOUBLE * c1 * c2)), 4) + 0.0 AS pmi
      |FROM pairs
      |JOIN (SELECT w AS w1, c AS c1 FROM uni) USING (w1)
      |JOIN (SELECT w AS w2, c AS c2 FROM uni) USING (w2)
      |CROSS JOIN tot
      |ORDER BY w1, w2""".stripMargin

  // ---------------------------------------------------------------- t15
  /** Per-document TF-IDF keyword extraction — the classic "what is this
    * document about" signal (tagging, topic routing, index enrichment):
    * top-3 tokens per doc by tf · ln(N/df). Plan shape is the posting
    * list again (t13's): tokenize-explode once → (doc, token) tf counts →
    * token df by re-aggregating the TF TABLE (never re-scanning text) →
    * join back on token → one per-doc window for the top-3 cut. Two
    * shuffles (token agg, doc window) + a broadcast 1-row N. The df join
    * shuffles on token, NOT broadcast: a 100 TB corpus vocabulary is
    * itself huge, and tf⋈df on token is the skew-safe equi-join (df rows
    * are one per distinct token — no hot-key explosion). Determinism:
    * scoring rounds to 6 places BEFORE the window, ties break token-asc —
    * both engines sort identical (rounded-double, string) keys.
    */
  def t15TfidfKeywords(spark: SparkSession, sfDir: String): DataFrame = {
    // checkpoint the TF table: it feeds both the df aggregation and the
    // join probe, and the two consumers don't canonicalize to a reused
    // exchange — without this the corpus is scanned AND tokenized twice,
    // the dominant cost at scale (m5's featurize-once pattern)
    val tf = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .pin()
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
    val nDocs = Tables(spark, sfDir, "documents")
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    tf.join(dft, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("token").as("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val t15Sql: String =
    """WITH tf AS (
      |  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY 1, 2),
      |dft AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
      |SELECT doc_id, CAST(rank AS INT) AS rank, token AS term, tfidf FROM (
      |  SELECT tf.doc_id, tf.token,
      |    round(tf.tf * ln(s.n_docs / d.df), 6) AS tfidf,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY round(tf.tf * ln(s.n_docs / d.df), 6) DESC, tf.token) AS rank
      |  FROM tf JOIN dft d USING (token) CROSS JOIN stats s)
      |WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- t16
  /** Bloom-prefiltered decontamination — t9's 100 TB plan: build an A9
    * Bloom filter ([[graft.functions.Bloom]], 2 KiB) over the BOUNDED
    * benchmark shingle set, prefilter every corpus shingle with the
    * codegen'd k-bit-test MAP-SIDE (the overwhelmingly-clean corpus never
    * reaches the join), and exact-verify only the bloom survivors against
    * the real set. Bloom has no false negatives and the semi-join removes
    * its ~2e-4 false positives, so the result is EXACTLY t9's — the
    * oracle is t9's SQL verbatim, and the equivalence (plus the bloom
    * actually filtering) is spec'd.
    * vs t9 at 100 TB: the broadcast the corpus probes per shingle drops
    * from the full benchmark hash set (tens of MB across eval suites) to
    * 2 KiB of bits, and only bloom-positive shingles (true hits + 2e-4
    * noise) pay the exact probe + the aggregation that follows.
    */
  def t16BloomDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), shingleHashes(col("text")).as("sh"))
      .pin() // shingles compute once: bench build + corpus probe
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("bsh")).distinct()
      .pin() // read twice: bloom build (action) + exact verify
    val bits = Bloom.build(bench, col("bsh"))
    val shared = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .filter(Bloom.contains(bits, col("s"))) // map-side 2 KiB prefilter
      .join(broadcast(bench), col("s") === col("bsh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // sh is distinct per doc already
    docs.select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: t9's verbatim — bloom-prefilter + exact verify ≡ semi-join. */
  val t16Sql: String = t9Sql

  // ---------------------------------------------------------------- t19
  /** DSIR importance weights — Data Selection via Importance Resampling
    * (Xie et al. 2023, the published target-domain data-selection gate):
    * score every document by how much more likely its hashed n-gram
    * features are under a TARGET domain's bag-of-ngrams model than under
    * the RAW corpus's. Features are the portable word-3-gram shingle
    * hashes bucketed mod [[DsirBuckets]] (the paper's hashed n-gram
    * trick: a fixed-size model regardless of vocabulary); both
    * distributions are Laplace-smoothed bucket frequencies; a doc's score
    * is the length-normalized sum of per-bucket log-ratios
    * λ_b = ln p_target(b) − ln p_raw(b), and `keep` is the score > 0 gate
    * (the doc looks more target-like than raw-like). Target here: four
    * of the twenty sources play the "trusted domain" (the spec asserts
    * the weights actually separate them).
    *
    * Plan, 100 TB-first: pass 1 builds the MODEL — explode shingles,
    * partial-agg per bucket (B = 4096 keys — the shuffle carries at most
    * B rows per partition), collect λ as a 4096-double MODEL PARAMETER
    * (the k×dim-centroid class of collect); pass 2 SCORES map-side: a
    * codegen'd `aggregate` over each doc's shingle array indexing the
    * broadcast λ literal — zero shuffle, zero join, per-row. Exactly the
    * two-pass shape a 100 TB DSIR run wants: the model is tiny and
    * global, the scoring is embarrassingly parallel.
    * Parity: ln noise absorbed by round(4) over the per-doc mean (t5's
    * argument); sums of identical doubles in different orders differ by
    * ~1e-13·n, far under the rounding grain.
    */
  val DsirBuckets = 4096
  val DsirTargets = Seq("src0", "src1", "src2", "src3")

  def t19DsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val B = DsirBuckets
    val isTarget = col("source").isin(DsirTargets.map(x => x: Any): _*)
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), shingleHashes(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val cnt = docs
      .select(isTarget.as("tgt"), explode(col("sh")).as("h"))
      .groupBy((col("h") % B).as("b"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("t"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("r"))
      .collect().map(row => (row.getLong(0).toInt, row.getLong(1), row.getLong(2)))
    val totT = cnt.map(_._2).sum
    val totR = cnt.map(_._3).sum
    val lam = Array.fill(B)(
      math.log(1.0 / (totT + B)) - math.log(1.0 / (totR + B)))
    cnt.foreach { case (b, ct, cr) =>
      lam(b) = math.log((ct + 1.0) / (totT + B)) - math.log((cr + 1.0) / (totR + B))
    }
    val lamLit = typedlit(lam.toSeq)
    docs
      .withColumn("n_sh", size(col("sh")).cast("long"))
      .withColumn("dsir_score", round(
        aggregate(col("sh"), lit(0.0),
          (acc, h) => acc + element_at(lamLit, (h % B).cast("int") + 1)) /
          col("n_sh"), 4) + lit(0.0))
      .select(col("doc_id"), col("n_sh"), col("dsir_score"),
        (col("dsir_score") > 0.0).as("keep"))
      .orderBy(col("doc_id"))
  }

  val t19Sql: String = {
    val B = DsirBuckets
    val tgt = DsirTargets.map(s => s"'$s'").mkString("(", ", ", ")")
    val ths = sqlTokenHashes("text")
    s"""WITH docs AS (SELECT doc_id, source, ${sqlShingles("ths")} AS sh
      |  FROM (SELECT doc_id, source, $ths AS ths FROM documents)),
      |nz AS (SELECT doc_id, source, sh FROM docs WHERE len(sh) > 0),
      |ex AS (SELECT doc_id, source, unnest(sh) % $B AS b FROM nz),
      |cnt AS (SELECT b,
      |    sum(CASE WHEN source IN $tgt THEN 1 ELSE 0 END) AS t,
      |    sum(CASE WHEN source IN $tgt THEN 0 ELSE 1 END) AS r
      |  FROM ex GROUP BY b),
      |tot AS (SELECT sum(t) AS tt, sum(r) AS tr FROM cnt),
      |lam AS (SELECT b, ln((t + 1.0) / (tt + $B.0)) - ln((r + 1.0) / (tr + $B.0)) AS lam
      |  FROM cnt CROSS JOIN tot),
      |sc AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_sh, sum(l.lam) AS s
      |  FROM ex e JOIN lam l USING (b) GROUP BY e.doc_id)
      |SELECT doc_id, n_sh, round(s / n_sh, 4) + 0.0 AS dsir_score,
      |  (round(s / n_sh, 4) + 0.0) > 0.0 AS keep
      |FROM sc ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t19_dsir_weights" -> (t19DsirWeights _),
    "t18_normalize" -> (t18Normalize _),
    "t17_lm_score" -> (t17LmScore _),
    "t16_bloom_decontaminate" -> (t16BloomDecontaminate _),
    "t15_tfidf_keywords" -> (t15TfidfKeywords _),
    "t14_collocations" -> (t14Collocations _),
    "t13_bm25_search" -> (t13Bm25Search _),
    "t12_boilerplate" -> (t12Boilerplate _),
    "t10_chunking" -> (t10Chunking _),
    "t11_seq_packing" -> (t11SeqPacking _),
    "t1_token_count" -> (t1TokenCount _),
    "t2_quality_score" -> (t2QualityScore _),
    "t3_langid" -> (t3LangId _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_surprisal" -> (t5Surprisal _),
    "t6_repetition" -> (t6Repetition _),
    "t7_gopher_rules" -> (t7GopherRules _),
    "t8_pii_redact" -> (t8PiiRedact _),
    "t9_contamination" -> (t9Contamination _))

  val sql: Map[String, String] = Map(
    "t19_dsir_weights" -> t19Sql,
    "t18_normalize" -> t18Sql,
    "t17_lm_score" -> t17Sql,
    "t16_bloom_decontaminate" -> t16Sql,
    "t15_tfidf_keywords" -> t15Sql,
    "t14_collocations" -> t14Sql,
    "t13_bm25_search" -> t13Sql,
    "t12_boilerplate" -> t12Sql,
    "t10_chunking" -> t10Sql,
    "t11_seq_packing" -> t11Sql,
    "t1_token_count" -> t1Sql,
    "t2_quality_score" -> t2Sql,
    "t3_langid" -> t3Sql,
    "t4_fingerprint" -> t4Sql,
    "t5_surprisal" -> t5Sql,
    "t6_repetition" -> t6Sql,
    "t7_gopher_rules" -> t7Sql,
    "t8_pii_redact" -> t8Sql,
    "t9_contamination" -> t9Sql)
}
