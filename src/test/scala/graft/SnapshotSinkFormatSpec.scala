package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Layout

/** The engine-native streaming sink (`format("graft-snapshot")`,
  * [[graft.streaming.SnapshotSink]]) and its composition with the CDF
  * source: a table-to-table incremental pipeline, exactly-once on both
  * ends, whose only state is the engine checkpoint plus the manifests.
  */
class SnapshotSinkFormatSpec extends GraftSuite {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def ordersSlice(lo: Int, hi: Int) =
    Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("double").as("price"))
      .filter(col("key") % 100 >= lo && col("key") % 100 < hi)

  test("graft-cdf → transform → graft-snapshot is exactly-once end to end, incl. incremental restart and pure replay") {
    val dir = tmp("native-pipe")
    val srcRoot = s"$dir/src"
    val dstRoot = s"$dir/dst"
    val ckpt = s"$dir/ckpt"

    Layout.snapshotAppend(spark, srcRoot, ordersSlice(0, 30))
    Layout.snapshotAppend(spark, srcRoot, ordersSlice(30, 60))

    def runPipe(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("path", srcRoot).load()
        .filter(col("price") > 50000)
        .select(col("key"), (col("price") * 2).as("price2"))
        .writeStream.format("graft-snapshot")
        .option("path", dstRoot)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def expected = Layout.readSnapshot(spark, srcRoot)
      .filter(col("price") > 50000)
      .select(col("key"), (col("price") * 2).as("price2"))

    runPipe()
    val out1 = Layout.readSnapshot(spark, dstRoot)
    assert(out1.exceptAll(expected).isEmpty && expected.exceptAll(out1).isEmpty,
      "first run must land exactly the transformed source")
    val v1 = Layout.snapshotVersions(spark, dstRoot)

    // PURE REPLAY: same checkpoint, no new source data → zero new commits
    runPipe()
    assert(Layout.snapshotVersions(spark, dstRoot) == v1,
      "an up-to-date restart must commit nothing")

    // INCREMENTAL RESTART: only the new source commit flows
    Layout.snapshotAppend(spark, srcRoot, ordersSlice(60, 90))
    runPipe()
    val out2 = Layout.readSnapshot(spark, dstRoot)
    assert(out2.exceptAll(expected).isEmpty && expected.exceptAll(out2).isEmpty,
      "the restarted stream must carry exactly the new delta — no dupes, " +
        "no gaps")
    assert(Layout.snapshotVersions(spark, dstRoot).size > v1.size)
    // every sink commit is stamped with the stream's writer + epoch
    val hist = Layout.snapshotHistory(spark, dstRoot)
    assert(hist.filter(col("writer").isNull).count() == 0,
      "sink commits must carry their writer token")
  }

  test("the sink refuses non-append modes and a missing checkpoint option") {
    val dir = tmp("native-sink-neg")
    import spark.implicits._
    val src = s"$dir/src2"
    Layout.snapshotAppend(spark, src,
      Seq((1L, 1.0)).toDF("key", "price"))
    val stream = spark.readStream.format("graft-cdf")
      .option("path", src).load()
    val noCkpt = intercept[Exception] {
      stream.writeStream.format("graft-snapshot")
        .option("path", s"$dir/dst2")
        .trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +: msgs(e.getCause))
    assert(msgs(noCkpt).exists(_.contains("checkpointLocation")))
    val badMode = intercept[Exception] {
      stream.groupBy(col("key")).count()
        .writeStream.format("graft-snapshot")
        .outputMode("complete")
        .option("path", s"$dir/dst3")
        .option("checkpointLocation", s"$dir/ckpt3")
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(msgs(badMode).exists(m =>
      m.contains("Append") || m.contains("not supported")))
  }

  test("maintenance compactions interleave with a live stream: epochs stay exactly-once across the version shift") {
    val dir = tmp("native-maint")
    val srcRoot = s"$dir/src"
    val dstRoot = s"$dir/dst"
    val ckpt = s"$dir/ckpt"
    def runPipe(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("path", srcRoot).load()
        .select(col("key"), col("price"))
        .writeStream.format("graft-snapshot")
        .option("path", dstRoot).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    Layout.snapshotAppend(spark, srcRoot, ordersSlice(0, 20))
    runPipe()
    // a compaction commits BETWEEN stream runs — the head version is no
    // longer epoch+1, which the old version-arithmetic contract refused
    val compacted = Layout.snapshotCompact(spark, dstRoot, 128L << 20)
    Layout.snapshotAppend(spark, srcRoot, ordersSlice(20, 40))
    runPipe()
    val expected = Layout.readSnapshot(spark, srcRoot)
      .select(col("key"), col("price"))
    val got = Layout.readSnapshot(spark, dstRoot)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "the stream must continue exactly-once past the interleaved commit")
    assert(Layout.snapshotVersions(spark, dstRoot).contains(compacted))
    // a pure replay still commits nothing
    val vs = Layout.snapshotVersions(spark, dstRoot)
    runPipe()
    assert(Layout.snapshotVersions(spark, dstRoot) == vs)
    // WIPED-CHECKPOINT GUARD survives the relaxed contract: a fresh
    // checkpoint (new writer id) against the existing table refuses
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-cdf")
        .option("path", srcRoot).load()
        .select(col("key"), col("price"))
        .writeStream.format("graft-snapshot")
        .option("path", dstRoot)
        .option("checkpointLocation", s"$dir/ckpt-wiped")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +: msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("appendToExisting")),
      s"fresh writer on a non-empty table must refuse, got: ${msgs(ex)}")
    // ... and the deliberate opt-in lands the full feed as a second copy
    Layout.snapshotAppend(spark, srcRoot, ordersSlice(40, 45))
    val q2 = spark.readStream.format("graft-cdf")
      .option("path", srcRoot).load()
      .select(col("key"), col("price"))
      .writeStream.format("graft-snapshot")
      .option("path", dstRoot)
      .option("checkpointLocation", s"$dir/ckpt-optin")
      .option("appendToExisting", "true")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val expect2 = Layout.readSnapshot(spark, srcRoot)
      .select(col("key"), col("price"))
    val got2 = Layout.readSnapshot(spark, dstRoot)
    // first stream's copy (through slice 40) + opt-in stream's full copy
    assert(got2.count() ==
      expected.count() + expect2.count(),
      "the opt-in stream appends its whole feed alongside the original")
  }
}
