package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST19: the dropped-late-row observability surface (SURVEY §2.7).
  *
  * The replay suites prove the streaming family's happy path and bounded
  * disorder; these tests prove the OPERATIONAL half — that data lost to
  * watermark eviction is *counted* where a production monitor can alarm
  * on it. Each test plants a late band BEYOND the watermark horizon
  * (files replay oldest-mtime-first, so the newest half advances the
  * watermark before the band arrives) and asserts
  * [[graft.streaming.WatermarkDropMonitor]]'s totals.
  */
class StreamObservabilitySpec extends GraftSuite {

  private def stage(dir: String, df: DataFrame, name: String): Unit = {
    val tmp = s"$dir/stage_$name"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/in/$name.parquet"))
  }

  /** Listener delivery is async — poll briefly before asserting. */
  private def await(cond: => Boolean, ms: Long = 30000L): Unit = {
    val t0 = System.currentTimeMillis
    while (!cond && System.currentTimeMillis - t0 < ms) Thread.sleep(200)
  }

  test("ST19/ST16: drop counter equals the planted beyond-horizon late band exactly; arrival tap counts every row") {
    val events = Tables(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft-st19a").toString
    val tsd = col("ts").cast("double")
    val b = events.agg(min(tsd).as("lo"), max(tsd).as("hi")).head()
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    // Newest half first (advances the watermark to hi − 2h), then a band
    // from the oldest DAY — weeks beyond the 2h horizon. Spark's late
    // filter uses the PREVIOUS batch's watermark (SPARK-39931 chained-
    // operator semantics: a record admitted while the watermark was still
    // low is processed, not dropped), so the new data ships as TWO files:
    // batch 0 advances the event-time stats, batch 1 cements them as the
    // late-filter watermark, and the band arriving in batch 2 is dropped.
    val newFile = events.filter(tsd >= lo + (hi - lo) / 2)
    val band = events.filter(tsd < lo + 86400.0)
    val mid = lo + 3 * (hi - lo) / 4
    stage(dir, newFile.filter(tsd < mid), "01_new")
    stage(dir, newFile.filter(tsd >= mid), "02_new")
    stage(dir, band, "03_late")
    // funnel filters to its three event types BEFORE the watermark, so the
    // exact expected count is the band's funnel-typed rows — the
    // [flat]mapGroupsWithState watermark filter runs on RAW input rows.
    val expectDropped = band
      .filter(col("event_type").isin("signup", "view", "purchase")).count()
    val expectArrivals = newFile.count() + band.count()
    assert(expectDropped > 0, "degenerate plant: no funnel-typed late rows")
    val monitor = streaming.EventStreams.monitorDrops(spark)
    try {
      val q = streaming.EventStreams
        .streamingFunnel(spark, s"$dir/in", events.schema)
        .writeStream.outputMode("update")
        .format("memory").queryName("st19_funnel_out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      await(monitor.dropped("st19_funnel_out") == expectDropped &&
        monitor.arrivals("st16_arrivals") == expectArrivals)
      assert(monitor.dropped("st19_funnel_out") === expectDropped,
        "numRowsDroppedByWatermark must equal the planted late-band size")
      assert(monitor.arrivals("st16_arrivals") === expectArrivals,
        "observe tap must count every arrival incl. the dropped ones")
    } finally spark.streams.removeListener(monitor)
  }

  test("ST19/ST18: windowed-agg drop counter fires on beyond-horizon late data; arrival tap exact") {
    val events = Tables(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft-st19b").toString
    val tsd = col("ts").cast("double")
    val b = events.agg(min(tsd).as("lo"), max(tsd).as("hi")).head()
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    // same three-file staging as the ST16 test: the late filter uses the
    // previous batch's watermark, so the band must arrive two batches
    // after the data that advanced it
    val newFile = events.filter(tsd >= lo + (hi - lo) / 2)
    val band = events.filter(tsd < lo + 86400.0)
    val mid = lo + 3 * (hi - lo) / 4
    stage(dir, newFile.filter(tsd < mid), "01_new")
    stage(dir, newFile.filter(tsd >= mid), "02_new")
    stage(dir, band, "03_late")
    val bandRows = band.count()
    assert(bandRows > 0)
    val monitor = streaming.EventStreams.monitorDrops(spark)
    try {
      val q = streaming.EventStreams
        .streamingAuditCounters(spark, s"$dir/in", events.schema)
        .writeStream.outputMode("append")
        .format("memory").queryName("st19_audit_out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      await(monitor.dropped("st19_audit_out") > 0 &&
        monitor.arrivals("st18_arrivals") == newFile.count() + bandRows)
      // For aggregations the watermark filter runs AFTER map-side partial
      // combine, so the unit is partial-agg rows, not raw rows: positive
      // whenever data was lost (the alarm condition), bounded by the raw
      // band size. The raw-row-exact contract lives on the
      // mapGroupsWithState path (previous test).
      val d = monitor.dropped("st19_audit_out")
      assert(d >= 1 && d <= bandRows,
        s"agg drop counter $d outside (0, $bandRows]")
      assert(monitor.arrivals("st18_arrivals") === newFile.count() + bandRows)
      // and the late band really was excluded from results: no emitted
      // window may predate the horizon the watermark finalized
      val emitted = spark.table("st19_audit_out")
      val bandMaxHr = band.agg(max(date_trunc("hour", col("ts")))).head().getTimestamp(0)
      assert(emitted.filter(col("window_start") <= lit(bandMaxHr)).count() === 0,
        "a band-hour window was emitted from beyond-horizon data")
    } finally spark.streams.removeListener(monitor)
  }
}
