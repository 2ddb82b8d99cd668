package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling both fact tables into the same bucket layout
  * makes the join exchange-free — the co-location strategy for repeated
  * big-big joins at 100 TB (pay one shuffle at write time, join free
  * forever after).
  */
class BucketingSpec extends GraftSuite {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // disable broadcast so the join strategy is driven by bucketing alone
    // (warehouse dir is set once in SparkSpec — it's a static conf)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      Tables(spark, sf, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // the join inputs read bucketed files directly — no Exchange below the join
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join, got:\n$plan")
      // and it computes the right thing
      val expect = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      assert(joined.exceptAll(expect).count() === 0)
      assert(expect.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

/** Append-mode watermarking: windows only emit once the watermark passes
  * their end — verified by feeding two files whose second batch advances
  * event time far enough to finalize the first batch's windows.
  */
class WatermarkAppendSpec extends GraftSuite {

  test("append-mode windows finalize as the watermark advances") {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft-wm").toString
    val half = events.count() / 2
    // file 1: first half by time; file 2: the rest (later timestamps).
    // The file stream source doesn't recurse, so move the single part-file
    // of each half up into the input dir as a flat file.
    val ordered = events.orderBy(col("ts")).cache()
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet"))
    }
    stage(ordered.limit(half.toInt), "01_early")
    stage(ordered.exceptAll(ordered.limit(half.toInt)), "02_late")
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("wm_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val emitted = spark.table("wm_out")
    // only windows whose end < final watermark may emit — and with ~7 days
    // of events split in two batches, at least the early windows must have
    assert(emitted.count() > 0, "watermark never finalized any window")
    // every emitted window agrees with the batch computation
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(emitted.exceptAll(batch).count() === 0,
      "append-mode emitted a window that disagrees with batch")
    ordered.unpersist()
  }
}
