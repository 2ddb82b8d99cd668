package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.ops.Pin.Pinned

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

  /** a6: per-domain cap (FineWeb-style): keep at most [[DomainCap]] docs per
    * source, preferring longer documents (n_chars DESC, doc_id tiebreak) —
    * the anti-spam guard against a single domain dominating the corpus.
    * 100 TB: one shuffle by source; Spark 4 rewrites the rank-filter into
    * WindowGroupLimit, so each map task forwards only its local top-K per
    * source and the shuffle carries O(sources·K), not the corpus. A skewed
    * mega-domain therefore costs its top-K per upstream partition, not its
    * full row count.
    */
  val DomainCap = 15

  def a6DomainCap(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= DomainCap)
      .orderBy(col("doc_id"))
  }

  val a6Sql: String =
    s"""SELECT doc_id, source, n_chars, rk FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= $DomainCap
      |ORDER BY doc_id""".stripMargin

  /** a7: weighted upsampling ("epochs"): replicate each document
    * n_copies = ⌊w⌋ (+1 for a deterministic hash-fraction of rows to realize
    * the fractional part), with per-source weight w = 1 + 0.25·(K mod 8) for
    * srcK — the mixture-weights primitive for curriculum/recipe training
    * (high-quality sources repeat, the rest pass through once).
    * 100 TB: pure map-side — the weight is a function of the row, the
    * replication is a generator (explode) inside the scan stage; no shuffle,
    * no RNG state, identical output on retry. Integer centi-weights keep the
    * fraction compare exact on both engines.
    */
  def a7WeightedUpsample(spark: SparkSession, sfDir: String): DataFrame = {
    val k = substring(col("source"), 4, 10).cast("int")
    val wCenti = lit(100) + lit(25) * (k % 8)
    val frac = wCenti % 100
    val whole = ((wCenti - frac) / 100).cast("int")
    val bucket = hashBucket(
      concat(col("source"), lit("@"), col("doc_id").cast("string")), 100)
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("n_copies",
        whole + when(bucket < frac, 1).otherwise(0))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  val a7Sql: String = {
    val key = sqlHashBucket("source || '@' || CAST(doc_id AS VARCHAR)", 100)
    """SELECT doc_id, source, n_copies, unnest(range(1, n_copies + 1)) AS copy_idx
      |FROM (
      |  SELECT doc_id, source,
      |    CAST((w_centi - w_centi % 100) / 100 AS INT)
      |      + CASE WHEN KEYEXPR < w_centi % 100 THEN 1 ELSE 0 END AS n_copies
      |  FROM (
      |    SELECT doc_id, source,
      |      100 + 25 * (CAST(substr(source, 4) AS INT) % 8) AS w_centi
      |    FROM documents))
      |ORDER BY doc_id, copy_idx""".stripMargin.replace("KEYEXPR", key)
  }

  /** a8: fixed-SIZE uniform sample per stratum (a4 samples at a RATE; audits
    * and eval sets need exactly-k): rank docs within each source by the
    * scrambled hash (uniform pseudo-random order, no RNG state) with doc_id
    * as tiebreak, keep the first [[SamplePerSource]]. Deterministic across
    * runs/retries/engines — the distributed replacement for reservoir
    * sampling, without its merge-order sensitivity.
    * 100 TB: the rank filter is WindowGroupLimit (same partial top-k as
    * a6) — each map task forwards k rows per source, shuffle is
    * O(sources·k).
    */
  val SamplePerSource = 8

  def a8GroupSample(spark: SparkSession, sfDir: String): DataFrame = {
    val key = hashBucket(
      concat(col("source"), lit("~"), col("doc_id").cast("string")), 1000000)
    val w = Window.partitionBy(col("source")).orderBy(key, col("doc_id"))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SamplePerSource)
      .orderBy(col("doc_id"))
  }

  val a8Sql: String = {
    val key = sqlHashBucket("source || '~' || CAST(doc_id AS VARCHAR)", 1000000)
    s"""SELECT doc_id, source, rk FROM (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY KEYEXPR, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= $SamplePerSource
      |ORDER BY doc_id""".stripMargin.replace("KEYEXPR", key)
  }

  // ---------------------------------------------------------------- a9
  /** Leakage-safe train/val/test split: the split key is the CONTENT hash,
    * not the row id, so byte-identical documents can never straddle a
    * split boundary — the eval-set leak that id-keyed splits silently
    * commit whenever the corpus still contains duplicates (and at 100 TB
    * it always does between dedup runs). 90/5/5 via the same scrambled
    * hash-bucket machinery as a4 (deterministic, map-side, reproducible
    * across engines/runs/retries); near-duplicates need d2's clusters as
    * the key instead — same operator, coarser key.
    */
  def a9LeakageSafeSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = hashBucket(md5(col("text").cast("binary")), 1000)
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(bucket < 900, "train").when(bucket < 950, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  val a9Sql: String = {
    val bucket = sqlHashBucket("md5(text)", 1000)
    s"""SELECT doc_id,
      |  CASE WHEN BUCKET < 900 THEN 'train'
      |       WHEN BUCKET < 950 THEN 'val' ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin.replace("BUCKET", bucket)
  }

  // ---------------------------------------------------------------- a10
  /** Cluster-balanced sampling — semantic-DIVERSITY subsetting for
    * training data (SemDeDup/coreset style): assign every embedding to
    * its IVF cell, keep exactly [[ClusterSampleK]] per cell by the
    * deterministic scrambled-hash order. Where a8 balances by a LABEL
    * (source), a10 balances by learned CONTENT geometry: over-represented
    * semantic regions are capped to the same budget as rare ones.
    * 100 TB: the assignment is s3's zero-shuffle codegen'd argmin over
    * broadcast centroid literals; the per-cell exactly-k is a6/a8's
    * WindowGroupLimit partial top-k — map tasks forward ≤k rows per cell,
    * so shuffle volume is O(cells·k), not O(corpus).
    */
  val ClusterSampleK = 8

  def a10ClusterSample(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.similarity.Similarity
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < Similarity.NLists)
      .orderBy(col("vec_id")).select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray).toSeq
    val key = hashBucket(concat(col("cid").cast("string"), lit("~"),
      col("vec_id").cast("string")), 1000000)
    val w = Window.partitionBy(col("cid")).orderBy(key, col("vec_id"))
    e.withColumn("cid", Similarity.assignCid(col("v"), cents).cast("long"))
      .select(col("vec_id"), col("cid"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ClusterSampleK)
      .orderBy(col("vec_id"))
  }

  val a10Sql: String = {
    val key = graft.functions.sqlHashBucket(
      "CAST(cid AS VARCHAR) || '~' || CAST(vec_id AS VARCHAR)", 1000000)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |cent AS (SELECT vec_id AS cid, v AS cv FROM e
      |         WHERE vec_id < ${graft.similarity.Similarity.NLists}),
      |assign AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, cent.cid,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_dot_product(e.v, e.v) - 2.0 * list_dot_product(e.v, cent.cv)
      |          + list_dot_product(cent.cv, cent.cv), cent.cid) AS rn
      |    FROM e CROSS JOIN cent) WHERE rn = 1)
      |SELECT vec_id, cid, rk FROM (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY cid ORDER BY KEYEXPR, vec_id) AS rk
      |  FROM assign)
      |WHERE rk <= $ClusterSampleK
      |ORDER BY vec_id""".stripMargin.replace("KEYEXPR", key)
  }

  // ---------------------------------------------------------------- a11
  /** EMBARGOED TEMPORAL SPLIT (de Prado's purged time-series split) — the
    * other production split shape next to a9's content-hash split: when
    * the model predicts the FUTURE, the eval set must be strictly later
    * than training, and rows inside an embargo band after the cutoff are
    * EXCLUDED entirely — a test row minutes after the boundary shares
    * sessions/labels with the training tail, the classic temporal leak a
    * plain `ts < T` split commits. train = ts < T; (purged) ∈ [T, T+gap);
    * test = ts ≥ T+gap.
    * 100 TB: one map-side predicate, no shuffle; on a date-partitioned
    * layout each split prunes to its partition range at the scan. The
    * cutoff is a fixed literal, not a computed quantile — split
    * definitions must be REPRODUCIBLE artifacts (re-deriving T from data
    * moves the boundary every ingest, silently re-labeling rows).
    */
  val A11Cutoff = "2024-01-22 00:00:00"
  val A11EmbargoHours = 24

  def a11TemporalSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit(A11Cutoff).cast("timestamp")
    val gapEnd = cut + expr(s"INTERVAL $A11EmbargoHours HOURS")
    // the band exclusion is an explicit OR of range predicates, NOT a
    // CASE-then-isNotNull — only this form pushes to the parquet scan
    // (row-group pruning on ts statistics skips the band's files)
    Tables(spark, sfDir, "events")
      .filter(col("ts") < cut || col("ts") >= gapEnd)
      .select(col("event_id"), col("user_id"),
        when(col("ts") < cut, "train").otherwise("test").as("split"))
      .orderBy(col("event_id"))
  }

  val a11Sql: String =
    s"""SELECT event_id, user_id,
      |  CASE WHEN ts < TIMESTAMP '$A11Cutoff' THEN 'train' ELSE 'test' END AS split
      |FROM events
      |WHERE ts < TIMESTAMP '$A11Cutoff'
      |   OR ts >= TIMESTAMP '$A11Cutoff' + INTERVAL $A11EmbargoHours HOURS
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- a12
  /** TOKEN-BUDGET mixture sampling — the mixing primitive that directly
    * matches how training mixes are actually specified: "this run takes
    * 400M tokens of web, 1.2B of code", i.e. a TOKEN budget per source,
    * not a row rate (a4/a5 sample rows; doc length varies 100×, so a row
    * rate badly misses a token target). Each source admits documents, in
    * a deterministic scrambled-hash order, until its budget is exhausted:
    * kept iff the doc's cumulative-token START position < budget (the
    * boundary-crossing doc is kept — budgets are floors, truncation
    * happens at sequence packing, t11).
    *
    * The cumulative position is a DISTRIBUTED PREFIX SUM, the textbook
    * two-phase shape — a single window cumsum per source would serialize
    * each source onto one task (the a5 skew note, but for windows):
    * (1) docs hash into [[A12Bands]] ordered bands per source; the
    *     within-band cumsum windows over (source, band) partitions —
    *     corpus/|bands| rows each, `spark.sql.shuffle.partitions`-wide
    *     parallelism regardless of source skew;
    * (2) band OFFSETS come from the per-(source, band) token totals — a
    *     sources×bands aggregate (640 rows here; bounded at any corpus
    *     scale) whose own cumsum is trivially cheap — broadcast back.
    * keep ⇔ offset + within-band-cum − n_tokens < budget. Admission order
    * is (band, scrambled-hash, doc_id) — fully deterministic and
    * content/ingest-order independent, so the mix is a reproducible
    * artifact (a9's contract) and the oracle replays it exactly.
    * Budgets are a pure function of the source name (base × (1 + idx%3))
    * so the oracle rebuilds them; production broadcasts a budget map.
    */
  val A12Bands = 32
  val A12BudgetBase = 400L

  def a12TokenBudgetMix(spark: SparkSession, sfDir: String): DataFrame =
    a12TokenBudgetMixWith(spark, sfDir, graft.functions.WhitespaceTokenizer)

  /** [[a12TokenBudgetMix]] under an injected [[graft.functions.Tokenizer]]
    * — banding, offsets and admission are tokenizer-agnostic
    * (`TokenizerSpec`).
    */
  def a12TokenBudgetMixWith(spark: SparkSession, sfDir: String,
      tok: graft.functions.Tokenizer): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        tok.countCol(col("text")).as("n_tokens"),
        hashBucket(concat(col("source"), lit("#"), col("doc_id").cast("string")),
          A12Bands).as("band"),
        hashBucket(concat(col("source"), lit("@"), col("doc_id").cast("string")),
          1000000).as("pos"))
      .pin() // tokenize+hash once: the cumsum branch AND the
      // offset aggregate both read this (t15's featurize-once rule —
      // without it the corpus is scanned and tokenized twice)
    val wIn = Window.partitionBy(col("source"), col("band"))
      .orderBy(col("pos"), col("doc_id"))
    val withCum = docs.withColumn("cum", sum(col("n_tokens")).over(wIn))
    val wBand = Window.partitionBy(col("source")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("source"), col("band"))
      .agg(sum(col("n_tokens")).as("band_tokens"))
      .withColumn("offset",
        coalesce(sum(col("band_tokens")).over(wBand), lit(0L)))
      .select(col("source"), col("band"), col("offset"))
    val budget = lit(A12BudgetBase) *
      (lit(1L) + substring(col("source"), 4, 10).cast("long") % 3)
    withCum.join(broadcast(offsets), Seq("source", "band"))
      .withColumn("start_tokens", col("offset") + col("cum") - col("n_tokens"))
      .filter(col("start_tokens") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("start_tokens"))
      .orderBy(col("doc_id"))
  }

  val a12Sql: String = {
    val band = sqlHashBucket("source || '#' || CAST(doc_id AS VARCHAR)", A12Bands)
    val pos = sqlHashBucket("source || '@' || CAST(doc_id AS VARCHAR)", 1000000)
    s"""WITH docs AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    $band AS band, $pos AS pos
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, source, n_tokens, band,
      |    sum(n_tokens) OVER (PARTITION BY source, band
      |      ORDER BY pos, doc_id) AS cum
      |  FROM docs),
      |offsets AS (
      |  SELECT source, band,
      |    coalesce(sum(band_tokens) OVER (PARTITION BY source ORDER BY band
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM (SELECT source, band, sum(n_tokens) AS band_tokens
      |        FROM docs GROUP BY 1, 2))
      |SELECT doc_id, source, n_tokens,
      |  CAST(off + cum - n_tokens AS BIGINT) AS start_tokens
      |FROM cum JOIN offsets USING (source, band)
      |WHERE off + cum - n_tokens <
      |  $A12BudgetBase * (1 + CAST(substr(source, 4) AS BIGINT) % 3)
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- ST28
  /** ST28: LIVE token-budget admission gate — a12 STREAMED, the ingest
    * shape a live curation pipeline actually runs ("keep admitting web
    * docs until this mix's 400M-token web slice is full, then close the
    * gate"): per micro-batch, the standing per-source CONSUMED-TOKEN
    * counters (epoch-keyed parquet, the ST25 state pattern) decide how
    * much budget remains; the batch admits its docs in deterministic
    * (scrambled-hash, doc_id) order until each source's budget floor is
    * crossed (boundary doc kept — a12's floor rule), then appends its
    * admitted token counts to the counters.
    *
    * SEMANTICS vs a12, stated honestly: a12 orders the WHOLE corpus by
    * scrambled hash (a reproducible offline artifact); the live gate
    * admits in ARRIVAL order across batches (within a batch: the same
    * hash order) — what a gate that must answer at ingest time can do.
    * The admitted set is exactly the batch a12-style prefix of the
    * ARRIVAL-ordered feed, and the spec asserts that equality.
    *
    * EXACTLY-ONCE under replay (ST25's argument verbatim): counters and
    * admitted lists are epoch-keyed OVERWRITES (`…/e=N`), and the
    * standing read takes only epochs STRICTLY BEFORE this one — a
    * crash-replayed epoch excludes its own partial write, recomputes the
    * identical admission, and overwrites its slot.
    *
    * 100 TB: per-trigger cost is O(batch) (one window over the batch +
    * one |sources|-row counter read); the admitted prefix property makes
    * the state just |sources| longs per epoch — compaction-friendly and
    * trivially rebuildable from the admitted lists.
    */
  def st28AdmitBatch(spark: SparkSession, batch: DataFrame, root: String,
      epoch: Long,
      tok: graft.functions.Tokenizer =
        graft.functions.WhitespaceTokenizer): DataFrame = {
    val countersDir = s"$root/counters"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasState = fs.exists(new org.apache.hadoop.fs.Path(countersDir))
    val consumed =
      if (!hasState) null
      else spark.read.parquet(countersDir).filter(col("e") < epoch)
        .groupBy(col("source")).agg(sum(col("toks")).as("consumed"))
    val docs = batch.select(col("doc_id"), col("source"),
      tok.countCol(col("text")).as("n_tokens"),
      hashBucket(concat(col("source"), lit("@"), col("doc_id").cast("string")),
        1000000).as("pos"))
    val wIn = Window.partitionBy(col("source")).orderBy(col("pos"), col("doc_id"))
    val budget = lit(A12BudgetBase) *
      (lit(1L) + substring(col("source"), 4, 10).cast("long") % 3)
    val base = docs.withColumn("cum", sum(col("n_tokens")).over(wIn))
    val withConsumed =
      if (consumed == null) base.withColumn("consumed", lit(0L))
      else base.join(broadcast(consumed), Seq("source"), "left")
        .withColumn("consumed", coalesce(col("consumed"), lit(0L)))
    val admitted = withConsumed
      .withColumn("start_tokens", col("consumed") + col("cum") - col("n_tokens"))
      .filter(col("start_tokens") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("start_tokens"))
      .pin() // pin BEFORE the counter write mutates the state
    admitted.groupBy(col("source")).agg(sum(col("n_tokens")).as("toks"))
      .write.mode("overwrite").parquet(s"$countersDir/e=$epoch")
    admitted
  }

  /** The streaming driver: file-source micro-batches through
    * [[st28AdmitBatch]]; admitted lists land epoch-keyed under
    * `$root/admitted` (same overwrite-idempotence as the counters).
    */
  def streamingTokenBudgetGate(spark: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType,
      root: String,
      tok: graft.functions.Tokenizer = graft.functions.WhitespaceTokenizer)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        st28AdmitBatch(spark, batch, root, epoch, tok)
          .write.mode("overwrite").parquet(s"$root/admitted/e=$epoch")
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  // ---------------------------------------------------------------- a13
  /** a13: EXACT-quota stratified allocation — the hard-budget form of a4:
    * a4's hash-rate filter realizes each stratum's share only in
    * expectation (±√n noise), but a training-mix budget is often EXACT
    * ("this mix contributes 200 documents, allocated proportionally").
    * Quotas come from the LARGEST-REMAINDER (Hamilton) method in pure
    * integer arithmetic — base_s = ⌊n_s·N/total⌋, the N − Σbase leftover
    * seats go to the largest remainders (n_s·N mod total, ties by source
    * name) — so Σ quota_s = N EXACTLY, every stratum gets ⌊share⌋ or
    * ⌊share⌋+1, and there is no float anywhere in the allocation (the
    * oracle agrees bit-for-bit by construction). Selection inside a
    * stratum is the top-quota rows by scrambled hash (ties by doc_id) —
    * a4's determinism argument, but rank-based so the count is exact.
    * 100 TB: the allocation runs over |strata| rows (one partial-agg pass
    * + one |strata|-row window — never the corpus); selection is one
    * window rank per stratum (WindowGroupLimit-prunable since the
    * predicate is rank ≤ quota) on the same source shuffle.
    */
  val QuotaBudget = 200

  def a13QuotaSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("source"))
    val cnt = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val tot = Window.partitionBy() // |strata| rows — a bounded window
    val quotas = cnt
      .withColumn("total", sum(col("n_s")).over(tot))
      .withColumn("base", expr(s"(n_s * $QuotaBudget) div total")) // integer div
      .withColumn("remd", (col("n_s") * QuotaBudget) % col("total"))
      .withColumn("shortfall", lit(QuotaBudget) - sum(col("base")).over(tot))
      .withColumn("rr", row_number().over(
        Window.partitionBy().orderBy(col("remd").desc, col("source"))))
      .withColumn("quota",
        col("base") + when(col("rr") <= col("shortfall"), 1L).otherwise(0L))
      .select(col("source"), col("quota"))
    val pick = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    docs
      .withColumn("hk", hashBucket(
        concat(col("source"), lit("#"), col("doc_id").cast("string")), 1048576))
      .withColumn("rk", row_number().over(pick))
      .join(quotas, Seq("source"))
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("quota"))
      .orderBy(col("doc_id"))
  }

  val a13Sql: String = {
    val key = sqlHashBucket("source || '#' || CAST(doc_id AS VARCHAR)", 1048576)
    s"""WITH cnt AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source),
      |q AS (
      |  SELECT source,
      |    CAST(base + CASE WHEN rr <= shortfall THEN 1 ELSE 0 END AS BIGINT) AS quota
      |  FROM (
      |    SELECT source, base,
      |      $QuotaBudget - CAST(sum(base) OVER () AS BIGINT) AS shortfall,
      |      row_number() OVER (ORDER BY remd DESC, source) AS rr
      |    FROM (
      |      SELECT source,
      |        CAST((n_s * $QuotaBudget) // CAST(sum(n_s) OVER () AS BIGINT) AS BIGINT) AS base,
      |        CAST((n_s * $QuotaBudget) % CAST(sum(n_s) OVER () AS BIGINT) AS BIGINT) AS remd
      |      FROM cnt))),
      |ranked AS (
      |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
      |    ORDER BY $key, doc_id) AS rk
      |  FROM documents)
      |SELECT r.doc_id, r.source, q.quota
      |FROM ranked r JOIN q ON r.source = q.source
      |WHERE r.rk <= q.quota
      |ORDER BY r.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- a14
  /** DSIR IMPORTANCE RESAMPLING — the "R" the t19 weights exist for
    * (Xie et al. 2023): draw a fixed-size training subset WITHOUT
    * replacement with probability ∝ exp(score/T), via the Gumbel-top-k
    * identity (taking the k largest g_i = w_i/T − ln(−ln u_i) IS a
    * without-replacement sample from softmax(w/T) — Vieira 2014's
    * distributed-friendly form of weighted reservoir sampling): no
    * sequential draws, no rejection loop, one key per doc. u_i is the
    * DETERMINISTIC scrambled hash of doc_id mapped into (0,1) open on
    * both ends, so the sample is a reproducible artifact (a9's contract)
    * and the oracle replays it exactly; g rounds to 6 decimals (ln-noise
    * grain, t5's argument) with doc_id tie-break.
    *
    * The top-k itself is a12's TWO-PHASE DISTRIBUTED RANK, not a global
    * single-partition window: g quantizes into ordered bands (monotone
    * in g, so band-major order ≡ g order; the oracle's plain global
    * row_number certifies the equivalence), rank = exclusive band-count
    * cumsum (a ≤[[A14Bands]]-row broadcast) + within-band row_number
    * over bounded partitions. k = ⌊n/5⌋ (select the best fifth).
    * 100 TB: scoring is t19's zero-shuffle pass; the rank adds one
    * bounded-partition window + one tiny aggregate — never a full-corpus
    * single-task sort.
    */
  val A14Bands = 128
  val A14Temp = 0.5

  def a14DsirResample(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = graft.text.TextOps.t19DsirWeights(spark, sfDir)
      .select(col("doc_id"), col("dsir_score"))
    val uB = 1000000000L
    val u = (hashBucket(col("doc_id").cast("string"), uB.toInt) + lit(1L))
      .cast("double") / lit((uB + 2).toDouble)
    val keyed = scored
      .withColumn("g",
        round(col("dsir_score") / A14Temp - log(-log(u)), 6) + lit(0.0))
      .pin() // score+key once: rank branch and offsets both read it
    val k = keyed.count() / 5
    bandedRank(keyed, col("g"), col("doc_id"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("dsir_score"), col("g").as("gumbel_key"),
        col("rank"))
      .orderBy(col("doc_id"))
  }

  /** GLOBAL RANK by (g DESC, id ASC) WITHOUT a single-partition sort —
    * a12's two-phase distributed prefix-sum shape applied to ranking:
    * g quantizes into ordered coarse bands (floor of an affine map is
    * WEAKLY monotone in g — subtraction and doubling are order-preserving
    * in doubles — which is all band-major order needs, since the
    * within-band window re-orders by g exactly; values outside [−32, 32]
    * clamp into the edge bands, still ordered, just unbalanced), each
    * band ranks in a bounded-partition window, and the exclusive
    * band-count cumsum (a ≤[[A14Bands]]-row broadcast) lifts the ranks
    * global. `PropertySpec` certifies equality with the driver-side
    * global sort on generated keys, clamp range included.
    */
  private[graft] def bandedRank(df: DataFrame, g: Column, id: Column): DataFrame = {
    val banded = df.withColumn("__band", least(greatest(
      floor((lit(32.0) - g) * 2.0), lit(0.0)),
      lit((A14Bands - 1).toDouble)).cast("int"))
    val wIn = Window.partitionBy(col("__band")).orderBy(g.desc, id)
    val wBand = Window.orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("__band_n"))
      .withColumn("__offset",
        coalesce(sum(col("__band_n")).over(wBand), lit(0L)))
      .select(col("__band"), col("__offset"))
    banded
      .withColumn("__rk", row_number().over(wIn))
      .join(broadcast(offsets), Seq("__band"))
      .withColumn("rank", (col("__offset") + col("__rk")).cast("long"))
      .drop("__band", "__band_n", "__rk", "__offset")
  }

  val a14Sql: String = {
    import graft.text.TextOps.{DsirBuckets => B, DsirTargets}
    val tgt = DsirTargets.map(s => s"'$s'").mkString("(", ", ", ")")
    val ths = sqlTokenHashes("text")
    val u = s"(${sqlHashBucket("CAST(doc_id AS VARCHAR)", 1000000000)} + 1) / 1000000002.0"
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
      |sc AS (SELECT e.doc_id, round(sum(l.lam) / count(*), 4) + 0.0 AS dsir_score
      |  FROM ex e JOIN lam l USING (b) GROUP BY e.doc_id),
      |keyed AS (SELECT doc_id, dsir_score,
      |    round(dsir_score / $A14Temp - ln(-ln($u)), 6) + 0.0 AS g
      |  FROM sc),
      |ranked AS (SELECT doc_id, dsir_score, g,
      |    CAST(row_number() OVER (ORDER BY g DESC, doc_id) AS BIGINT) AS rank
      |  FROM keyed)
      |SELECT doc_id, dsir_score, g AS gumbel_key, rank
      |FROM ranked
      |WHERE rank <= (SELECT count(*) // 5 FROM sc)
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- a15
  /** REPRODUCIBLE PER-EPOCH GLOBAL SHUFFLE — the training-data ORDERING
    * op (data order is part of the training recipe: epochs must see the
    * corpus in different orders, yet any rerun/resume must reproduce the
    * exact same order): epoch e's permutation is the global rank of the
    * scrambled hash of "e#doc_id" (doc_id tie-break on the rare
    * collisions), so it is a pure function of (epoch, doc_id) — no RNG
    * state, no shuffle files to keep, decorrelated across epochs by the
    * hash (spec measures the two permutations disagreeing almost
    * everywhere). Ranking is [[bandedRank]] per epoch (the hash maps
    * affinely into the band domain — strictly monotone, ulp-safe at
    * integer hash spacing), never a single-partition sort.
    * 100 TB: the "shuffle" ships (epoch, doc_id, position) — 24 bytes a
    * row — not documents; a resumed run recomputes any position locally.
    */
  val A15Epochs = 2

  def a15EpochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"))
    (0 until A15Epochs).map { ep =>
      val keyed = docs
        .withColumn("epoch", lit(ep))
        .withColumn("h", hashBucket(
          concat(lit(s"$ep#"), col("doc_id").cast("string")), 1000000))
        // affine map into the band domain: strictly DECREASING in h, so
        // bandedRank's g-descending order is exactly h-ascending
        .withColumn("g", lit(32.0) - col("h").cast("double") * (64.0 / 1000000.0))
      bandedRank(keyed, col("g"), col("doc_id"))
        .select(col("epoch"), col("doc_id"), col("rank").as("position"))
    }.reduce(_ unionAll _).orderBy(col("epoch"), col("doc_id"))
  }

  val a15Sql: String = {
    val h = sqlHashBucket(
      "CAST(epoch AS VARCHAR) || '#' || CAST(doc_id AS VARCHAR)", 1000000)
    // epoch list generated from A15Epochs — a literal VALUES would
    // silently break Scala/SQL parity if the constant ever moved
    val epochs = (0 until A15Epochs).map(e => s"($e)").mkString(", ")
    s"""SELECT epoch, doc_id,
      |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY $h, doc_id)
      |    AS BIGINT) AS position
      |FROM documents CROSS JOIN (VALUES $epochs) AS e(epoch)
      |ORDER BY epoch, doc_id""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a15_epoch_shuffle" -> (a15EpochShuffle _),
    "a14_dsir_resample" -> (a14DsirResample _),
    "a13_quota_sample" -> (a13QuotaSample _),
    "a12_token_budget_mix" -> (a12TokenBudgetMix _),
    "a11_temporal_split" -> (a11TemporalSplit _),
    "a10_cluster_sample" -> (a10ClusterSample _),
    "a9_leakage_safe_split" -> (a9LeakageSafeSplit _),
    "a8_group_sample" -> (a8GroupSample _),
    "a4_stratified_sample" -> (a4StratifiedSample _),
    "a5_temperature_mix" -> (a5TemperatureMix _),
    "a6_domain_cap" -> (a6DomainCap _),
    "a7_weighted_upsample" -> (a7WeightedUpsample _))

  val sql: Map[String, String] = Map(
    "a15_epoch_shuffle" -> a15Sql,
    "a14_dsir_resample" -> a14Sql,
    "a13_quota_sample" -> a13Sql,
    "a12_token_budget_mix" -> a12Sql,
    "a11_temporal_split" -> a11Sql,
    "a10_cluster_sample" -> a10Sql,
    "a9_leakage_safe_split" -> a9Sql,
    "a8_group_sample" -> a8Sql,
    "a4_stratified_sample" -> a4Sql,
    "a5_temperature_mix" -> a5Sql,
    "a6_domain_cap" -> a6Sql,
    "a7_weighted_upsample" -> a7Sql)
}
