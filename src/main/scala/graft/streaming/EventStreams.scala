package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Structured Streaming over `events` (SURVEY.md §2.7).
  *
  * The windowed aggregation is defined ONCE and applied to both the batch
  * and the streaming DataFrame — Structured Streaming's core promise. The
  * driver's oracle checks the batch result; StreamingSpec replays the same
  * file through `readStream` with a watermark and asserts the streaming
  * result equals the batch result.
  */
object EventStreams {

  /** Same nanos-long → µs-timestamp normalization as Tables, guarded on
    * the column actually being a long (a regenerated micros file passes
    * through untouched — batch and stream stay equivalent).
    */
  private def fixTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // watermark/event-time require TIMESTAMP; localize in the session
        // tz (UTC) — same contract as Tables.readerConfs
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Shared transform: 1-hour tumbling window counts/sums per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  // ---------------------------------------------------------------- st1
  def st1WindowAgg(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAgg(Tables(spark, sfDir, "events"))
      .orderBy(col("hour"), col("event_type"))

  val st1Sql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Streaming flavor of st1 for tests: file-source readStream with a
    * 2-hour watermark. Late data beyond the watermark is dropped — the
    * state store stays bounded at (watermark horizon / window) × |types|
    * entries regardless of input volume.
    */
  def streamingHourlyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    // FileStreamSource wants a directory; stage the single test file into a
    // temp dir (a production deployment points this at the landing dir).
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    // Use the RAW parquet schema (ts read as nanos-long, see Tables) and
    // apply the same µs conversion on the stream.
    graft.Tables.readerConfs(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream
      .schema(raw)
      .parquet(dir.toString)
      .transform(fixTs)
    hourlyAgg(stream.withWatermark("ts", "2 hours"))
  }

  /** ST3: custom stateful streaming via flatMapGroupsWithState — first-seen
    * dedup of (user_id, event_type) pairs. State per key is one boolean, so
    * the store stays at |keys| entries no matter how many events stream
    * through; Append mode emits each key exactly once.
    */
  case class EvKey(user_id: Long, event_type: String)

  def streamingFirstSeen(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    graft.Tables.readerConfs(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    spark.readStream.schema(raw).parquet(dir.toString)
      .transform(fixTs)
      .select(col("user_id"), col("event_type")).as[EvKey]
      .groupByKey(identity)
      .flatMapGroupsWithState[Boolean, EvKey](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: EvKey, rows: Iterator[EvKey], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(key) }
      }
      .toDF()
  }

  /** ST7: built-in streaming dedup with bounded state —
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the key's last-seen event time, so state size is
    * bounded by the watermark horizon regardless of stream length (the
    * flatMapGroupsWithState dedup above keeps state forever; this is the
    * operator to reach for when duplicates arrive close together).
    */
  def streamingDedupWithinWatermark(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.readerConfs(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-wmdedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    spark.readStream.schema(raw).parquet(dir.toString)
      .transform(fixTs)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
  }

  /** ST8: full sessionization as CUSTOM streaming state — the operator to
    * reach for when session semantics outgrow `session_window` (per-session
    * derived features, mid-session triggers, cross-session carryover).
    * flatMapGroupsWithState with EventTimeTimeout: per-user state is the
    * list of OPEN session intervals only; events merge into intervals with
    * the same end-exclusive 30-min gap rule as st2 (a gap of exactly 30:00
    * starts a new session); a session emits EXACTLY ONCE, when the
    * watermark passes its end (= last event + gap) — either on the batch
    * that advances the watermark or via the registered timeout on a
    * no-data batch. State is bounded: open sessions span at most the
    * watermark horizon + gap of event time per user.
    * StatefulStreamingSpec asserts emitted ≡ the st2 batch sessions that
    * the final watermark finalized.
    */
  val SessionGapUs: Long = 30L * 60 * 1000000

  case class SessOpen(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  def streamingSessionize(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .withWatermark("ts", "2 hours")
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[SessOpen], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[List[SessOpen]]) =>
          // merge open intervals + incoming points, end-exclusive gap rule
          // (merge iff next.start − cur.last < gap, matching session_window)
          val incoming = rows.map(r => toUs(r._2)).toSeq.sorted
          val pieces = (state.getOption.getOrElse(Nil) ++
            incoming.map(t => SessOpen(t, t, 1L))).sortBy(s => (s.startUs, s.lastUs))
          val merged = pieces.foldLeft(List.empty[SessOpen]) { (acc, s) =>
            acc match {
              case h :: t if s.startUs - h.lastUs < SessionGapUs =>
                SessOpen(h.startUs, math.max(h.lastUs, s.lastUs), h.n + s.n) :: t
              case _ => s :: acc
            }
          }.reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(s => s.lastUs + SessionGapUs <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            val nextCloseMs = open.map(s => s.lastUs + SessionGapUs).min / 1000L
            state.setTimeoutTimestamp(
              math.max(nextCloseMs, state.getCurrentWatermarkMs() + 1L))
          }
          closed.iterator.map(s => SessionOut(user, toTs(s.startUs),
            toTs(s.lastUs + SessionGapUs), s.n))
      }
      .toDF()
  }

  /** ST9: streaming CDC compaction — the LIVE materialization of
    * q50_cdc_compact: per (user_id, event_type) key, maintain the latest
    * (ts, event_id)-ordered row and the running version count as keyed
    * state; each batch emits the key's current compacted row (Update mode),
    * so downstream always sees the freshest state and the FINAL emission
    * per key equals the batch compaction of the whole changelog
    * (StatefulStreamingSpec replays a two-file time-split stream and
    * asserts exactly that).
    * State size is |live keys| × one small struct — the same bound as the
    * compacted table itself, the natural floor for this operator (no
    * watermark needed; a TTL'd production variant would evict keys idle
    * past a horizon via EventTimeTimeout).
    */
  case class CdcKey(user_id: Long, event_type: String)
  case class CdcState(tsUs: Long, eventId: Long, value: Double, n: Long)
  case class CdcOut(user_id: Long, event_type: String, last_event_id: Long,
      last_ts: java.sql.Timestamp, last_value: Double, n_updates: Long)

  def streamingCdcCompact(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .as[(Long, String, java.sql.Timestamp, Long, Double)]
      .groupByKey(r => CdcKey(r._1, r._2))
      .mapGroupsWithState[CdcState, CdcOut](GroupStateTimeout.NoTimeout) {
        (key: CdcKey, rows: Iterator[(Long, String, java.sql.Timestamp, Long, Double)],
            state: GroupState[CdcState]) =>
          var st = state.getOption.getOrElse(
            CdcState(Long.MinValue, Long.MinValue, 0.0, 0L))
          rows.foreach { r =>
            val us = toUs(r._3)
            if (us > st.tsUs || (us == st.tsUs && r._4 > st.eventId))
              st = CdcState(us, r._4, r._5, st.n + 1)
            else st = st.copy(n = st.n + 1)
          }
          state.update(st)
          CdcOut(key.user_id, key.event_type, st.eventId, toTs(st.tsUs),
            st.value, st.n)
      }
      .toDF()
  }

  /** ST11: windowed heavy hitters over a stream — the Misra-Gries typed
    * Aggregator (graft.functions.MisraGriesAggregator) running INSIDE a
    * watermarked streaming window aggregation: per 1-hour event-time
    * window, the ≤(k−1)-counter sketch of the hottest users. Shows custom
    * mergeable sketches compose with Structured Streaming state — the
    * map-side-partial property that makes MG scale in batch is exactly
    * what bounds its per-window streaming state at O(k).
    * The sketch is arrival-order dependent, so the spec asserts the
    * DETERMINISTIC MG guarantees per emitted window (retention above
    * n/k, undercount ≤ n/k vs exact counts), not map equality.
    */
  val HHSketchK = 11

  def streamingHeavyHitters(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.HeavyHitters
        .misraGries(HHSketchK, col("user_id").cast("string")).as("hh"))
      .select(col("window.start").as("window_start"), col("hh"))
  }

  /** ST17: windowed streaming QUANTILES — the KLL sketch (A7) running as
    * a watermarked streaming window aggregate, completing the
    * sketch-∘-streaming-state compositions (ST11 does it for Misra-Gries).
    * Per-window state is the O(cap·log) compactor stack, merged by the
    * engine across micro-batches exactly like any partial aggregate —
    * live per-window latency/price percentiles without buffering window
    * rows. The spec measures per-emitted-window rank error vs that
    * window's exact values over a two-file replay.
    */
  def streamingWindowQuantiles(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.QuantileSketch
        .kllQuantiles(col("value"), Seq(0.25, 0.5, 0.75)).as("qs"))
      .select(col("window.start").as("window_start"), col("qs"))
  }

  /** ST18: streaming per-window AUDIT COUNTERS — q75's live monitoring
    * form: the violation/health counters an ingest pipeline alarms on
    * (error-type events, value outliers, distinct actives), maintained
    * per event-time hour as a watermarked window aggregate. Rules are
    * conditional sums, so the per-window state is a handful of longs
    * (partial-aggregated map-side like any agg) and adding a rule costs a
    * column, not an operator; append mode emits each hour's final audit
    * row exactly once at watermark passage. Spec: emitted rows ≡ the
    * batch per-hour audit over the same events.
    */
  val AuditOutlierCut = 400.0

  def streamingAuditCounters(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      // ST19 arrival tap: raw-arrival denominator for drop alarming
      .observe("st18_arrivals", count(lit(1)).as("n_input"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        sum(when(col("value") > AuditOutlierCut, 1L).otherwise(0L)).as("n_outliers"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(col("window.start").as("window_start"), col("n_events"),
        col("n_errors"), col("n_outliers"), col("n_users_approx"))
  }

  /** ST4: watermarked stream-stream join — purchases joined to the same
    * user's clicks within the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so each side's
    * state store retains only one hour of rows (the unbounded-state trap
    * of naive stream joins is exactly what the time bound removes).
    */
  def streamStreamJoin(events: DataFrame, joinType: String = "inner"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      joinType)
  }

  // ---------------------------------------------------------------- st3
  /** ST4's batch equivalent, oracle-checked: the purchases×clicks-within-
    * one-hour join is the SAME transform batch or streaming (watermarks are
    * no-ops on batch); the driver verifies the batch result against plain
    * SQL while StreamStreamJoinSpec asserts stream ≡ batch.
    */
  def st3StreamJoin(spark: SparkSession, sfDir: String): DataFrame =
    streamStreamJoin(Tables(spark, sfDir, "events"))
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
      .orderBy(col("p_id"), col("c_id"))

  val st3Sql: String =
    """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
      |  c.event_id AS c_id, c.ts AS c_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p_id, c_id""".stripMargin

  // ---------------------------------------------------------------- st4
  /** ST3's batch equivalent, oracle-checked: first-seen dedup of
    * (user_id, event_type) emits each key exactly once — over a bounded
    * input that is exactly DISTINCT. StatefulStreamingSpec asserts the
    * flatMapGroupsWithState stream produces the same key set.
    */
  def st4FirstSeenKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type"))

  val st4Sql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- st5
  /** ST6's batch equivalent, oracle-checked: the left-outer time-bounded
    * join — unmatched purchases surface with null click columns (what the
    * streaming form emits after watermark eviction).
    */
  def st5StreamJoinOuter(spark: SparkSession, sfDir: String): DataFrame =
    streamStreamJoin(Tables(spark, sfDir, "events"), "left_outer")
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
      .orderBy(col("p_id"), col("c_id"))

  val st5Sql: String =
    """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
      |  c.event_id AS c_id, c.ts AS c_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p_id, c_id""".stripMargin

  /** Streaming flavor over the staged file source (see ST3). */
  def streamingPurchaseClicks(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.readerConfs(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(raw).parquet(dir.toString)
      .transform(fixTs)
    streamStreamJoin(stream)
  }


  // ---------------------------------------------------------------- st2
  /** Built-in session windows: `session_window(ts, gap)` assigns each event
    * to a gap-delimited session (same 30-min semantics as the manual
    * lag+cumsum sessionization in q24, computed by the native operator).
    * Works identically over batch and streams; the oracle recomputes the
    * session bounds with the q24-style window SQL.
    */
  def st2SessionWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  // Session end = last event + gap (session_window semantics); the manual
  // SQL reproduces exactly that from the lag+cumsum construction. The gap
  // compare is in µs with >=: Spark's session window is end-EXCLUSIVE, so
  // an inter-event gap of exactly 30:00.000000 starts a NEW session.
  val st2Sql: String =
    """SELECT user_id, session_start, session_end, n_events, sum_value FROM (
      |  SELECT user_id,
      |    min(ts) AS session_start,
      |    max(ts) + INTERVAL 30 MINUTE AS session_end,
      |    count(*) AS n_events,
      |    CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
      |  FROM (
      |    SELECT user_id, ts, value,
      |      sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |    FROM (
      |      SELECT user_id, ts, value, event_id,
      |        CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 30*60*1000000
      |             THEN 1 ELSE 0 END AS new_session
      |      FROM (SELECT user_id, ts, value, event_id,
      |              lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
      |                ORDER BY ts, event_id) AS prev_us
      |            FROM events)))
      |  GROUP BY user_id, session_id)
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- st6
  /** ST12's batch equivalent, oracle-checked: temperature mixing (a5's
    * α=1/2 downsampling-only rates) RE-DERIVED PER 1-HOUR EVENT-TIME
    * WINDOW — the live-ingest form of corpus rebalancing, where stratum
    * frequencies drift over time and each window flattens its OWN
    * distribution: rate_s(w) = ⌊1000·√(n_min(w)/n_s(w))⌋ per-mille, keep =
    * the same deterministic hash filter as a5.
    * 100 TB: counts are one windowed partial agg (|windows|·|types| rows,
    * model-scale); the per-window min is a window function over that tiny
    * frame; the keep filter joins rates back broadcast and runs map-side.
    */
  def st6TempMix(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.hashBucket
    val w = Tables(spark, sfDir, "events")
      .select(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"), col("event_id"))
    val counts = w.groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byWin = org.apache.spark.sql.expressions.Window.partitionBy(col("window_start"))
    val rates = counts
      .withColumn("n_min", min(col("n")).over(byWin))
      .select(col("window_start"), col("event_type"),
        floor(lit(1000) * sqrt(col("n_min").cast("double") / col("n")))
          .cast("int").as("rate_permille"))
    val key = hashBucket(
      concat(col("event_type"), lit("#"), col("event_id").cast("string")), 1000)
    w.join(broadcast(rates), Seq("window_start", "event_type"))
      .filter(key < col("rate_permille"))
      .select(col("window_start"), col("event_type"), col("event_id"),
        col("rate_permille"))
      .orderBy(col("window_start"), col("event_type"), col("event_id"))
  }

  val st6Sql: String = {
    val key = graft.functions.sqlHashBucket(
      "event_type || '#' || CAST(event_id AS VARCHAR)", 1000)
    """WITH w AS (SELECT date_trunc('hour', ts) AS window_start, event_type, event_id
      |           FROM events),
      |counts AS (SELECT window_start, event_type, count(*) AS n
      |           FROM w GROUP BY 1, 2),
      |rates AS (
      |  SELECT window_start, event_type,
      |    CAST(floor(1000 * sqrt(CAST(n_min AS DOUBLE) / n)) AS INT) AS rate_permille
      |  FROM (SELECT *, min(n) OVER (PARTITION BY window_start) AS n_min FROM counts))
      |SELECT w.window_start, w.event_type, w.event_id, r.rate_permille
      |FROM w JOIN rates r USING (window_start, event_type)
      |WHERE KEYEXPR < rate_permille
      |ORDER BY window_start, event_type, event_id""".stripMargin
      .replace("KEYEXPR", key)
  }

  /** ST12: the LIVE form of st6 — streaming temperature mix with the rates
    * re-derived per watermark-complete window. A live pipeline cannot know
    * a window's stratum frequencies until the window closes, so the
    * operator buffers each open window's (type, id) rows as keyed state
    * (flatMapGroupsWithState keyed by window start, EventTimeTimeout) and,
    * when the watermark passes the window end, derives the rates from the
    * FINAL counts and emits exactly the rows the deterministic hash keeps
    * — byte-identical to the batch st6 of the same data, which is what
    * StatefulStreamingSpec asserts via a two-file replay.
    * State: O(rows per open window) ids+types (the price of exact
    * per-window rates); bounded by watermark horizon / window length open
    * windows. A production variant that tolerates approximate rates keeps
    * only per-stratum counts and samples the NEXT window at the previous
    * window's rates (O(|strata|) state, one-window rate lag).
    */
  val MixWindowUs: Long = 3600L * 1000000L

  case class MixOut(window_start: java.sql.Timestamp, event_type: String,
      event_id: Long, rate_permille: Int)

  def streamingTemperatureMix(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.functions.PortableHash
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .select(col("ts"), col("event_type"), col("event_id"))
      .as[(java.sql.Timestamp, String, Long)]
      .withWatermark("ts", "2 hours")
      .groupByKey(r => Math.floorDiv(toUs(r._1), MixWindowUs) * MixWindowUs)
      .flatMapGroupsWithState[List[(String, Long)], MixOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winUs: Long, rows: Iterator[(java.sql.Timestamp, String, Long)],
            state: GroupState[List[(String, Long)]]) =>
          val buf = state.getOption.getOrElse(Nil) ++
            rows.map(r => (r._2, r._3))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (winUs + MixWindowUs <= wmUs) {
            // window complete: rates from the FINAL counts, then the same
            // deterministic keep as a5/st6 (PortableHash ≡ hashBucket)
            state.remove()
            val counts = buf.groupBy(_._1).view.mapValues(_.size.toLong).toMap
            val nMin = counts.values.min
            val rates = counts.map { case (et, n) =>
              et -> math.floor(1000.0 * math.sqrt(nMin.toDouble / n)).toInt
            }
            buf.iterator
              .filter { case (et, id) =>
                PortableHash.scramble32(
                  PortableHash.charFold(s"$et#$id")) % 1000 < rates(et) }
              .map { case (et, id) => MixOut(toTs(winUs), et, id, rates(et)) }
          } else {
            state.update(buf)
            // fire when the watermark passes the window end, even on a
            // no-data batch
            state.setTimeoutTimestamp(math.max(
              (winUs + MixWindowUs) / 1000L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
      .toDF()
  }

  // ---------------------------------------------------------------- st7
  /** ST13's batch equivalent, oracle-checked: LAGGED temperature mixing —
    * the O(|strata|)-state live variant of st6. st6/ST12's exact
    * per-window rates force the operator to buffer every row until its own
    * window closes (state O(rows in the watermark horizon)). The
    * production alternative accepts a bounded staleness: sample the rows
    * of window w at the rates derived from window w − [[LagWindows]] —
    * old enough that, given the 2-hour disorder bound, the reference
    * window's counts are FINAL before any row of w needs a decision, so
    * rows emit without waiting for their own window to close and the
    * durable state is just the per-stratum reference counts.
    * The rate is per-stratum against a configured reference count
    * ([[MixRefCount]]; production sets the knee where thinning starts):
    * rate_s(w) = ⌊1000·min(1, √(NRef / n_s(w−Lag)))⌋ — no cross-stratum
    * min, which is exactly what makes the state per-key decomposable. A
    * reference window with no data keeps everything (cold start).
    */
  val LagWindows = 3
  val MixRefCount = 5

  def st7LaggedMix(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.hashBucket
    val w = Tables(spark, sfDir, "events")
      .select(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"), col("event_id"))
    val refCounts = w.groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select((col("window_start") + expr(s"INTERVAL $LagWindows HOURS"))
        .as("window_start"), col("event_type"), col("n"))
    val rate = when(col("n").isNull || col("n") <= MixRefCount, lit(1000))
      .otherwise(floor(lit(1000) *
        sqrt(lit(MixRefCount.toDouble) / col("n"))).cast("int"))
    val key = hashBucket(
      concat(col("event_type"), lit("#"), col("event_id").cast("string")), 1000)
    w.join(broadcast(refCounts), Seq("window_start", "event_type"), "left")
      .withColumn("rate_permille", rate)
      .filter(key < col("rate_permille"))
      .select(col("window_start"), col("event_type"), col("event_id"),
        col("rate_permille"))
      .orderBy(col("window_start"), col("event_type"), col("event_id"))
  }

  val st7Sql: String = {
    val key = graft.functions.sqlHashBucket(
      "event_type || '#' || CAST(event_id AS VARCHAR)", 1000)
    s"""WITH w AS (SELECT date_trunc('hour', ts) AS window_start, event_type, event_id
      |           FROM events),
      |counts AS (SELECT window_start + INTERVAL $LagWindows HOUR AS window_start,
      |             event_type, count(*) AS n
      |           FROM w GROUP BY 1, 2)
      |SELECT window_start, event_type, event_id, rate_permille FROM (
      |  SELECT w.window_start, w.event_type, w.event_id,
      |    CASE WHEN c.n IS NULL OR c.n <= $MixRefCount THEN 1000
      |         ELSE CAST(floor(1000 * sqrt(${MixRefCount}.0 / c.n)) AS INT)
      |    END AS rate_permille
      |  FROM w LEFT JOIN counts c
      |    ON c.window_start = w.window_start AND c.event_type = w.event_type)
      |WHERE KEYEXPR < rate_permille
      |ORDER BY window_start, event_type, event_id""".stripMargin
      .replace("KEYEXPR", key)
  }

  /** ST13: the LIVE form of st7 — per-stratum keyed state only. Keyed by
    * event_type; state = the stratum's per-window counts (bounded: a
    * window is evicted once no live row can reference it) plus the
    * transient rows whose reference window has not yet closed (in steady
    * flow rows decide in the batch after arrival — the reference is
    * Lag·len old — so the DURABLE state is O(windows-in-horizon) longs
    * per stratum, vs ST12's O(rows)). Decisions depend only on the
    * reference window's FINAL count (the watermark guarantees no more
    * updates) + the deterministic hash, so the emitted SET is
    * byte-identical to batch st7 regardless of batching — asserted over a
    * two-file replay.
    */
  case class LagMixState(counts: Map[Long, Long], pending: List[(Long, Long)])

  def streamingLaggedMix(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.functions.PortableHash
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val lagUs = LagWindows * MixWindowUs
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .select(col("ts"), col("event_type"), col("event_id"))
      .as[(java.sql.Timestamp, String, Long)]
      .withWatermark("ts", "2 hours")
      .groupByKey(_._2)
      .flatMapGroupsWithState[LagMixState, MixOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (et: String, rows: Iterator[(java.sql.Timestamp, String, Long)],
            state: GroupState[LagMixState]) =>
          val st = state.getOption.getOrElse(LagMixState(Map.empty, Nil))
          var counts = st.counts
          var pending = st.pending
          rows.foreach { r =>
            val winUs = Math.floorDiv(toUs(r._1), MixWindowUs) * MixWindowUs
            counts = counts.updated(winUs, counts.getOrElse(winUs, 0L) + 1L)
            pending ::= ((winUs, r._3))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // a row of window w decides when its reference window w − Lag·len
          // is FINAL, i.e. wm ≥ its end = w − (Lag−1)·len
          val (ready, wait) = pending.partition(p =>
            p._1 - (LagWindows - 1) * MixWindowUs <= wmUs)
          val out = ready.reverseIterator.flatMap { case (w, id) =>
            val n = counts.getOrElse(w - lagUs, 0L)
            val rate = if (n <= MixRefCount) 1000
              else math.floor(1000.0 * math.sqrt(MixRefCount.toDouble / n)).toInt
            if (PortableHash.scramble32(
                PortableHash.charFold(s"$et#$id")) % 1000 < rate)
              Some(MixOut(toTs(w), et, id, rate))
            else None
          }.toList
          // evict counts no live or future row can reference: live windows
          // are ≥ floorWin(wm) (earlier rows are watermark-dropped), and a
          // window w references w − Lag·len
          val floorWin = Math.floorDiv(wmUs, MixWindowUs) * MixWindowUs
          counts = counts.filter { case (w, _) => w >= floorWin - lagUs }
          if (wait.isEmpty && counts.isEmpty) state.remove()
          else {
            state.update(LagMixState(counts, wait))
            val nextMs =
              if (wait.nonEmpty)
                (wait.map(_._1).min - (LagWindows - 1) * MixWindowUs) / 1000L
              else wmUs / 1000L + MixWindowUs / 1000L // eviction-only tick
            state.setTimeoutTimestamp(
              math.max(nextMs, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
  }

  /** ST16: STREAMING conversion funnel — the live form of q70. Keyed by
    * user; the funnel state machine (earliest signup → earliest qualifying
    * view → earliest qualifying purchase) is only correct when events fold
    * in EVENT-TIME order, so arrivals buffer in state until the watermark
    * passes them and COMMIT in ts order — commits therefore happen in
    * global per-user ts order no matter how batches interleave (anything
    * older than a commit would have been watermark-dropped, not buffered).
    * Each invocation emits the user's best-current-knowledge funnel row:
    * the committed slots plus a PROVISIONAL fold of the still-buffered
    * tail (sorted); once every event has arrived the provisional fold IS
    * the total ts-order fold, so the final emission per user equals batch
    * q70 exactly (replay-spec'd). Ties fold signup < view < purchase at
    * equal ts — the order q70's ≥-comparisons admit.
    * State per user: 3 longs + the ≤watermark-horizon buffered tail —
    * ST8's bound.
    */
  val FunnelStepUs: Long = 7L * 86400 * 1000000

  case class FunnelSt(t1: Long, t2: Long, t3: Long, buf: List[(Long, Int)])
  case class FunnelOut(user_id: Long, t_signup: Option[java.sql.Timestamp],
      t_view: Option[java.sql.Timestamp],
      t_purchase: Option[java.sql.Timestamp], stage: Long)

  def streamingFunnel(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): Option[java.sql.Timestamp] =
      if (us == -1L) None
      else {
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        Some(t)
      }
    val rank = Map("signup" -> 0, "view" -> 1, "purchase" -> 2)
    // fold MUST see (ts, rank)-sorted input; first qualifying hit per slot
    // in that order is the conditional min q70 computes
    def fold(s0: (Long, Long, Long), evs: Seq[(Long, Int)]): (Long, Long, Long) =
      evs.sorted.foldLeft(s0) { case ((t1, t2, t3), (ts, k)) =>
        if (k == 0 && t1 == -1L) (ts, t2, t3)
        else if (k == 1 && t2 == -1L && t1 != -1L && ts >= t1 &&
          ts - t1 <= FunnelStepUs) (t1, ts, t3)
        else if (k == 2 && t3 == -1L && t2 != -1L && ts >= t2 &&
          ts - t2 <= FunnelStepUs) (t1, t2, ts)
        else (t1, t2, t3)
      }
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      // ST19 arrival tap: raw-arrival denominator for drop alarming
      .observe("st16_arrivals", count(lit(1)).as("n_input"))
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
      .withWatermark("ts", "2 hours")
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelSt, FunnelOut](GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
            state: GroupState[FunnelSt]) =>
          val st = state.getOption.getOrElse(FunnelSt(-1L, -1L, -1L, Nil))
          val buf = st.buf ++ rows.map(r => (toUs(r._2), rank(r._3)))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, wait) = buf.partition(_._1 <= wmUs)
          val (c1, c2, c3) = fold((st.t1, st.t2, st.t3), ripe)
          state.update(FunnelSt(c1, c2, c3, wait))
          if (wait.nonEmpty)
            state.setTimeoutTimestamp(math.max(wait.map(_._1).min / 1000L,
              state.getCurrentWatermarkMs() + 1L))
          val (p1, p2, p3) = fold((c1, c2, c3), wait)
          val stage = if (p1 == -1L) 0L else if (p2 == -1L) 1L
            else if (p3 == -1L) 2L else 3L
          FunnelOut(user, toTs(p1), toTs(p2), toTs(p3), stage)
      }
      .toDF()
  }

  // ---------------------------------------------------------------- st9
  /** ST20: STREAM-STATIC enrichment join — the remaining core streaming
    * join shape (ST4/ST6 cover stream-stream): a live event feed enriched
    * against a slowly-changing dimension table, the shape of every
    * "attach customer attributes to the clickstream" pipeline. The static
    * side is stateless by construction — no watermark, no state store;
    * Spark re-executes the join each micro-batch. (Re-execution alone
    * does NOT refresh a plain parquet dim — its file index is pinned at
    * DataFrame creation; live dim refresh needs the static frame
    * re-resolved per batch or a snapshot-isolated table format.)
    * Defined ONCE and applied to both the batch
    * and streaming frame. 100 TB: a bounded dim broadcasts (this shape);
    * a huge static side instead pre-buckets on the join key so each
    * micro-batch shuffles only the stream side — either way per-batch
    * cost is O(batch), never O(static).
    */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey"))),
      col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"), col("c_nationkey"))

  /** ST20's batch twin, oracle-checked; StreamingSpec asserts the
    * readStream form emits the identical row set.
    */
  def st9StreamEnrich(spark: SparkSession, sfDir: String): DataFrame =
    enrichWithCustomer(Tables(spark, sfDir, "events"),
      Tables(spark, sfDir, "customer"))
      .orderBy(col("event_id"))

  val st9Sql: String =
    """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, c.c_nationkey
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY e.event_id""".stripMargin

  /** ST20 live form: file-source readStream enriched per micro-batch. */
  def streamingEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.readerConfs(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    enrichWithCustomer(
      spark.readStream.schema(raw).option("maxFilesPerTrigger", "1")
        .parquet(dir.toString).transform(fixTs),
      Tables(spark, sfDir, "customer"))
  }

  // ---------------------------------------------------------------- ST27
  /** ST27: streaming DISTRIBUTION-DRIFT monitor (PSI) — the observability
    * shape on top of the ST18 audit counters: not "how many errors" but
    * "has the VALUE DISTRIBUTION moved", the alarm a feature/ingest
    * pipeline wants before a shifted upstream silently poisons training
    * data. Per event-time day, the value column buckets into
    * [[DriftBins]] fixed-width bins (same width_bucket shape as q23) and
    * the Population Stability Index vs a FROZEN reference distribution —
    * Σ_b (q_b − p_b)·ln(q_b/p_b), ε-smoothed — scores the window; psi >
    * [[DriftPsiAlarm]] (the industry 0.2 threshold) flags drift. The
    * reference is batch-computed once from the baseline period (first
    * week, [[DriftRefCutoff]]) and handed to the stream as plain doubles
    * — the production split: baselines are frozen offline artifacts, the
    * stream only counts.
    * Per-window state is [[DriftBins]]+1 longs (conditional sums, partial-
    * aggregated map-side like any agg); the PSI fold is a post-agg
    * projection, so append mode emits each day's final score exactly once
    * at watermark passage. Determinism: the PSI sum is a FIXED-ORDER
    * 8-term expression tree (not an aggregate over bins), both engines
    * evaluate identical IEEE operands left-to-right, round(6) absorbs ln
    * ulp noise (t5's argument), and the drift flag compares the ROUNDED
    * psi so the boundary can't diverge.
    * 100 TB: reference is O(bins) broadcast-free literals; stream state
    * O(windows·bins) longs; the batch twin is one scan + one 1-row
    * reference aggregate crossed into O(days) rows.
    */
  val DriftBins = 8
  val DriftBinWidth = 20.0
  val DriftRefCutoff = "2024-01-08"
  val DriftPsiAlarm = 0.2

  private def driftBin: org.apache.spark.sql.Column =
    least(floor(col("value") / DriftBinWidth), lit(DriftBins - 1.0)).cast("int")

  /** Frozen-baseline bin fractions from the reference period (batch). */
  def driftReference(events: DataFrame): Seq[Double] = {
    val aggs = (0 until DriftBins).map(b =>
      sum(when(driftBin === b, 1L).otherwise(0L)).as(s"c$b")) :+
      count(lit(1)).as("n")
    val row = events.filter(col("ts") < lit(DriftRefCutoff).cast("timestamp"))
      .agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(DriftBins).toDouble
    (0 until DriftBins).map(b => row.getLong(b) / n)
  }

  /** Shared windowed-PSI transform (batch twin and live form). */
  private def driftAgg(events: DataFrame, refP: Seq[Double]): DataFrame = {
    val aggs = count(lit(1)).as("n_events") +: (0 until DriftBins).map(b =>
      sum(when(driftBin === b, 1L).otherwise(0L)).as(s"c$b"))
    val terms = (0 until DriftBins).map { b =>
      val q = greatest(col(s"c$b").cast("double") /
        col("n_events").cast("double"), lit(1e-6))
      val p = greatest(lit(refP(b)), lit(1e-6))
      (q - p) * log(q / p)
    }
    val psi = round(terms.reduce(_ + _), 6)
    events
      .groupBy(window(col("ts"), "1 day"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +: col("n_events") +:
        (0 until DriftBins).map(b => col(s"c$b")): _*)
      .withColumn("psi", psi)
      .withColumn("is_drifted", (col("psi") > DriftPsiAlarm).cast("int"))
      .select(col("window_start"), col("n_events"), col("psi"), col("is_drifted"))
  }

  /** Batch twin over an arbitrary events frame (reference derived from
    * ITS baseline period) — st10's body and the replay spec's oracle.
    */
  def driftMonitorOf(events: DataFrame): DataFrame =
    driftAgg(events, driftReference(events))

  def st10DriftMonitor(spark: SparkSession, sfDir: String): DataFrame =
    driftMonitorOf(Tables(spark, sfDir, "events")).orderBy(col("window_start"))

  val st10Sql: String = {
    val bin = s"CAST(least(floor(value / $DriftBinWidth), ${DriftBins - 1}.0) AS INT)"
    def cs(alias: String) = (0 until DriftBins)
      .map(b => s"sum(CASE WHEN b = $b THEN 1 ELSE 0 END) AS $alias$b")
      .mkString(", ")
    val psi = (0 until DriftBins).map { b =>
      val q = s"greatest(c$b / CAST(n_events AS DOUBLE), 1e-6)"
      val p = s"greatest(r$b / CAST(rn AS DOUBLE), 1e-6)"
      s"($q - $p) * ln($q / $p)"
    }.mkString(" + ")
    s"""WITH binned AS (SELECT ts, $bin AS b FROM events),
      |ref AS (SELECT count(*) AS rn, ${cs("r")}
      |        FROM binned WHERE ts < TIMESTAMP '$DriftRefCutoff'),
      |win AS (SELECT date_trunc('day', ts) AS window_start,
      |          CAST(count(*) AS BIGINT) AS n_events, ${cs("c")}
      |        FROM binned GROUP BY 1)
      |SELECT window_start, n_events, psi,
      |  CAST(psi > $DriftPsiAlarm AS INT) AS is_drifted
      |FROM (SELECT w.window_start, w.n_events, round($psi, 6) AS psi
      |      FROM win w CROSS JOIN ref r)
      |ORDER BY window_start""".stripMargin
  }

  /** ST27 live form: the same windowed PSI as a watermarked streaming
    * aggregate; `refP` is the frozen baseline from [[driftReference]].
    */
  def streamingDriftMonitor(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      refP: Seq[Double]): DataFrame =
    driftAgg(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inputDir)
        .transform(fixTs)
        .withWatermark("ts", "2 days"),
      refP)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st10_drift_monitor" -> (st10DriftMonitor _),
    "st9_stream_enrich" -> (st9StreamEnrich _),
    "st1_window_agg" -> (st1WindowAgg _),
    "st2_session_window" -> (st2SessionWindow _),
    "st3_stream_join" -> (st3StreamJoin _),
    "st4_first_seen_keys" -> (st4FirstSeenKeys _),
    "st5_stream_join_outer" -> (st5StreamJoinOuter _),
    "st6_temp_mix" -> (st6TempMix _),
    "st7_lagged_mix" -> (st7LaggedMix _))

  val sql: Map[String, String] = Map(
    "st10_drift_monitor" -> st10Sql,
    "st9_stream_enrich" -> st9Sql,
    "st1_window_agg" -> st1Sql,
    "st2_session_window" -> st2Sql,
    "st3_stream_join" -> st3Sql,
    "st4_first_seen_keys" -> st4Sql,
    "st5_stream_join_outer" -> st5Sql,
    "st6_temp_mix" -> st6Sql,
    "st7_lagged_mix" -> st7Sql)

  /** ST23: windowed streaming DISTINCT-COUNT via the HLL sketch — A6's
    * composition into streaming state, completing the sketch∘streaming
    * matrix (ST11 = frequencies/MG, ST17 = ranks/KLL, this = cardinality/
    * HLL): per event-time hour, the live distinct-actives counter every
    * engagement dashboard wants, with per-window state = one HLL register
    * array instead of the distinct key set. HLL updates are hash-based
    * and merge is register-wise max — commutative, associative,
    * duplicate-idempotent — so the streamed sketch is EXACTLY the batch
    * sketch regardless of micro-batch slicing (the spec asserts estimate
    * equality, not a tolerance). Append mode emits each hour once at
    * watermark passage.
    */
  def streamingWindowDistinct(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        hll_sketch_estimate(col("sk")).as("n_users"), col("n_events"))
  }

  /** ST22: REFRESHING-dim enrichment — the live-dim half ST20's scaladoc
    * scopes out: a plain parquet DataFrame pins its file index at
    * creation, so the static side of a stream-static join never sees dim
    * updates. The production pattern is `foreachBatch` RE-RESOLVING the
    * dim per micro-batch (`spark.read` inside the batch function — a
    * fresh file index every trigger), then running the same batch join;
    * each micro-batch therefore joins the dim AS OF its own trigger — the
    * slowly-changing-dimension semantics an attribute-enrichment pipeline
    * wants. Per-batch cost: one dim listing + the O(batch) join (the dim
    * broadcast re-builds per trigger — bounded dims only; a huge dim
    * belongs in a snapshot-isolated table format instead).
    * Spec: two micro-batches with the dim snapshot SWAPPED between them —
    * batch-1 rows carry snapshot A's attribute, batch-2 rows carry B's.
    */
  def streamingEnrichRefreshing(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType, dimDir: String,
      outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .transform(fixTs)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val dim = batch.sparkSession.read.parquet(dimDir) // fresh index per trigger
        enrichWithCustomer(batch, dim)
          .write.mode("append").parquet(outDir)
      }
  }

  /** ST24: streaming AS-OF enrichment — q20's live form, the last core
    * streaming join shape after ST20 (static dim) and ST22 (dim refreshed
    * per trigger = PROCESSING-time semantics): attach to each event the
    * latest dim version with version_ts ≤ the event's EVENT-time, from an
    * interleaved feed of events and dim-version (CDC) rows sharing one
    * watermark.
    *
    * flatMapGroupsWithState keyed on the join key; state =
    *  - the key's recent dim VERSIONS, watermark-bounded: all versions
    *    newer than the watermark plus ONE older version (the newest ≤ wm
    *    — any future event's as-of match can only be it or a newer one;
    *    every older version is superseded for every event still to come);
    *  - PENDING events buffered until the watermark passes their ts.
    * An event resolves only at watermark passage: any dim version that
    * could still change its answer has version_ts ≤ event_ts ≤ wm, and a
    * row older than the watermark would be dropped on arrival, not
    * applied — so waiting for the watermark is exactly what makes the
    * emission equal the batch as-of under bounded disorder (the replay
    * spec interleaves a dim update BETWEEN event micro-batches and a
    * late-but-in-horizon event, and asserts emitted ≡ the batch as-of of
    * the same feed). Ties (version_ts == event_ts) apply the version, the
    * ≤ the batch form uses; version timestamps are assumed unique per key
    * (CDC commit order).
    *
    * 100 TB: state per key is O(versions in the watermark horizon) + the
    * buffered event tail — the standing footprint is one carried version
    * per key, i.e. the dim's own size, sharded by the same key shuffle as
    * any keyed stream; per-trigger work is O(batch). Append mode: each
    * event emits exactly once.
    */
  /** ST26: STREAMING SCD2 maintenance — q79's live form, completing the
    * changelog triple (ST9 = live SCD1 latest-wins, ST24 = live as-of
    * lookup, ST26 = live HISTORY build): each key's closed validity
    * intervals emit as dimension rows the moment their successor version
    * is watermark-final. flatMapGroupsWithState keyed by (user_id,
    * event_type); state = the OPEN version (valid_from, event_id, value,
    * version#) + the watermark-buffered pending rows (ST24's ripeness
    * rule: a row applies only once the watermark passes its ts, which is
    * exactly what makes the fold ≡ batch q79's (ts, event_id) order under
    * bounded disorder — an in-horizon late change lands BETWEEN already-
    * arrived versions correctly because neither has been folded yet).
    * q79's no-op collapse applies identically: a ripe row whose value
    * equals the open version's extends it instead of opening an interval.
    * Append mode: closed versions emit exactly once; the open (is_current)
    * row per key lives in state — it IS the SCD1 surface, queryable from
    * the state store or emitted on a terminal flush.
    * 100 TB: state per key = one open-version struct + the ≤horizon
    * buffered tail (ST8's bound); per-trigger work O(batch); the emitted
    * stream appends straight into q79's warehouse dimension layout.
    * Replay spec: emitted ≡ the batch q79 fold's CLOSED rows on the same
    * feed, including an in-horizon late version landing mid-chain and a
    * cross-batch no-op replay collapsing.
    */
  case class Scd2St(curFromUs: Long, curEventId: Long, curValue: Double,
      curVersion: Int, pending: List[(Long, Long, Double)], hasCur: Boolean)
  case class Scd2Out(user_id: Long, event_type: String, version: Int,
      event_id: Long, valid_from: java.sql.Timestamp,
      valid_to: java.sql.Timestamp, value: Double)

  def streamingScd2(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
      .as[(Long, String, Long, java.sql.Timestamp, Double)]
      .withWatermark("ts", "2 hours")
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Scd2St, Scd2Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String),
            rows: Iterator[(Long, String, Long, java.sql.Timestamp, Double)],
            state: GroupState[Scd2St]) =>
          var st = state.getOption.getOrElse(Scd2St(0L, 0L, 0.0, 0, Nil, hasCur = false))
          var pending = st.pending
          rows.foreach(r => pending ::= ((toUs(r._4), r._3, r._5)))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, wait) = pending.partition(_._1 <= wmUs)
          val out = scala.collection.mutable.ListBuffer.empty[Scd2Out]
          ripe.sortBy(r => (r._1, r._2)).foreach { case (us, eid, v) =>
            if (!st.hasCur)
              st = st.copy(curFromUs = us, curEventId = eid, curValue = v,
                curVersion = 1, hasCur = true)
            else if (v != st.curValue) { // q79's no-op collapse
              out += Scd2Out(key._1, key._2, st.curVersion, st.curEventId,
                toTs(st.curFromUs), toTs(us), st.curValue)
              st = st.copy(curFromUs = us, curEventId = eid, curValue = v,
                curVersion = st.curVersion + 1)
            }
          }
          if (wait.isEmpty && !st.hasCur) state.remove()
          else {
            state.update(st.copy(pending = wait))
            if (wait.nonEmpty)
              state.setTimeoutTimestamp(math.max(wait.map(_._1).min / 1000L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
  }

  case class AsOfSt(versions: List[(Long, String)], pending: List[(Long, Long)])
  case class AsOfOut(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      attr: Option[String])

  def streamingAsOfEnrich(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inputDir)
      .select(col("kind"), col("key"), col("ts"), col("event_id"), col("attr"))
      .as[(String, Long, java.sql.Timestamp, Long, String)]
      .withWatermark("ts", "2 hours")
      .groupByKey(_._2)
      .flatMapGroupsWithState[AsOfSt, AsOfOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(String, Long, java.sql.Timestamp, Long, String)],
            state: GroupState[AsOfSt]) =>
          val st = state.getOption.getOrElse(AsOfSt(Nil, Nil))
          var versions = st.versions
          var pending = st.pending
          rows.foreach { r =>
            val us = toUs(r._3)
            if (r._1 == "d") versions ::= ((us, r._5))
            else pending ::= ((us, r._4))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, wait) = pending.partition(_._1 <= wmUs)
          val sortedV = versions.sortBy(_._1)
          val out = ripe.sortBy(_._1).map { case (ets, eid) =>
            AsOfOut(key, eid, toTs(ets),
              sortedV.takeWhile(_._1 <= ets).lastOption.map(_._2))
          }
          // version eviction (see scaladoc): newest ≤ wm + everything newer
          val (past, future) = sortedV.partition(_._1 <= wmUs)
          val kept = past.lastOption.toList ++ future
          if (wait.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsOfSt(kept, wait))
            if (wait.nonEmpty)
              state.setTimeoutTimestamp(math.max(wait.map(_._1).min / 1000L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
  }

  // ------------------------------------------------- ST19 observability

  /** Register a [[WatermarkDropMonitor]] on this session's stream manager
    * and return it. Registration is explicit — callers that run their own
    * listeners aren't double-counted — and the caller owns removal
    * (`spark.streams.removeListener(m)`).
    */
  def monitorDrops(spark: SparkSession): WatermarkDropMonitor = {
    val m = new WatermarkDropMonitor
    spark.streams.addListener(m)
    m
  }
}

/** ST19: dropped-late-row OBSERVABILITY for the streaming family.
  *
  * Structured Streaming drops rows older than the watermark INSIDE the
  * stateful operators — correctness-preserving but silent: when an
  * upstream feed starts lagging past the watermark horizon, data is lost
  * with no error surfaced anywhere. The replay specs prove the happy path
  * and bounded disorder; this is the operational half — the counters a
  * production pipeline alarms on:
  *
  *  - the engine's authoritative per-trigger
  *    `stateOperators[*].numRowsDroppedByWatermark` (raw input rows for
  *    `[flat]mapGroupsWithState` operators such as ST14/ST16, where the
  *    watermark filter runs on arrivals; PARTIAL-AGGREGATE rows for
  *    windowed aggregations such as ST18, where the filter runs after
  *    map-side combine — still nonzero exactly when data was lost, which
  *    is what an alarm needs);
  *  - the `Dataset.observe` arrival taps ST14/ST16/ST18 carry
  *    (`st14_arrivals`/`st16_arrivals`/`st18_arrivals`, metric
  *    `n_input`) — the denominator, counted on the same progress events.
  *
  * Both are folded into totals a monitor scrapes: drops keyed by QUERY
  * name, arrivals keyed by OBSERVATION name (stable across restarts of
  * differently-named queries running the same operator). Listener
  * delivery is asynchronous; read the totals after the query terminates
  * (the spec polls briefly). At 100 TB the counters are metadata-only —
  * `observe` is a running aggregate piggybacking on each task, the drop
  * counter a per-operator metric already maintained by the state store —
  * so the tap costs nothing per row.
  */
final class WatermarkDropMonitor
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  private val droppedByQuery =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private val arrivalsByTap =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val d = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
    if (d > 0)
      droppedByQuery.updateWith(name)(v => Some(v.getOrElse(0L) + d))
    p.observedMetrics.forEach { (tap, row) =>
      val idx = row.schema.fieldNames.indexOf("n_input")
      if (idx >= 0)
        arrivalsByTap.updateWith(tap)(v => Some(v.getOrElse(0L) + row.getLong(idx)))
    }
  }

  /** Total watermark-dropped rows for a query name (see class doc for the
    * raw-vs-partial row unit per operator kind). */
  def dropped(queryName: String): Long = droppedByQuery.getOrElse(queryName, 0L)

  /** Total arrivals seen by an observe tap (e.g. "st16_arrivals"). */
  def arrivals(tapName: String): Long = arrivalsByTap.getOrElse(tapName, 0L)
}
