package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Layout

/** `writeStream` SINK INTO A SNAPSHOT TABLE — the other half of the
  * engine-native streaming surface (the CDF source, [[CdfSourceProvider]],
  * is the read half): a stream lands as a manifest-versioned table, one
  * atomic commit per micro-batch,
  *
  * {{{
  * df.writeStream.format("graft-snapshot")
  *   .option("path", root).option("checkpointLocation", ckpt).start()
  * }}}
  *
  * EXACTLY-ONCE is the ST29 contract, now engine-wired: every batch
  * commits via [[Layout.snapshotAppendEpoch]] — replay detection keys
  * on (writer, epoch) HEADERS (the writer token is minted inside the
  * checkpoint directory: a genuine restart reads the same token and
  * replays no-op; a WIPED checkpoint loses the token with the epochs
  * and the fresh writer refuses a non-empty table loudly instead of
  * re-ingesting duplicates — `.option("appendToExisting", "true")` is
  * the deliberate form of that situation). Because the detection is
  * header-keyed rather than version-arithmetic, NON-STREAM commits may
  * interleave freely: a [[Layout.snapshotMaintain]] compaction between
  * triggers, another sink on the same table, a manual append — the
  * stream just commits its next epoch at the new head.
  *
  * Composed with the CDF source this closes the loop: `readStream
  * .format("graft-cdf")` → transforms → `format("graft-snapshot")` is a
  * table-to-table incremental pipeline, exactly-once END TO END, whose
  * only state is the engine checkpoint's two integers plus the
  * manifests themselves.
  *
  * 100 TB: a commit is O(batch bytes) data + O(new files) metadata
  * (segmented manifests); the sink adds no shuffle of its own.
  */
class SnapshotSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-snapshot appends manifest versions; output mode $outputMode " +
        "is not supported (aggregate upstream with foreachBatch + " +
        "snapshotOverwrite instead)")
    require(partitionColumns.isEmpty,
      "graft-snapshot takes no partitionBy; declare partCol/statsKey " +
        "table properties on the first commit instead")
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot needs .option(\"path\", <snapshot table root>)"))
    val ckpt = parameters.getOrElse("checkpointLocation",
      throw new IllegalArgumentException(
        "graft-snapshot needs .option(\"checkpointLocation\", …) — the " +
          "writer token that makes replays exact lives there"))
    new SnapshotSink(sqlContext, root, ckpt,
      parameters.get("statsKey"),
      parameters.get("appendToExisting").exists(_.toBoolean))
  }
}

class SnapshotSink(sqlContext: SQLContext, root: String, ckptDir: String,
    statsKey: Option[String], appendToExisting: Boolean = false)
    extends Sink {

  private def spark = sqlContext.sparkSession

  // minted once per sink instance; stable across batches, re-read (same
  // file) across restarts of the same checkpoint
  private lazy val writerId: String =
    Layout.streamWriterToken(spark, ckptDir)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame wraps the micro-batch's executed plan; rebind
    // it through its InternalRow RDD (ForeachBatchSink's shape) so the
    // commit path's ordinary .write works on it
    val batch = org.apache.spark.sql.GraftDatasetBridge
      .batchDataFrame(spark, data)
    // epoch-header replay detection (not the version=epoch+1 pin), so
    // maintenance compactions and other writers may interleave with the
    // stream — see [[Layout.snapshotAppendEpoch]]
    val v = Layout.snapshotAppendEpoch(spark, root, batch, batchId,
      writerId = writerId, appendToExisting = appendToExisting)
    // first commit may declare the stats column (carried thereafter)
    statsKey.foreach { sk =>
      val hdr = Layout.snapshotMeta(spark, root, v).header
      require(hdr.get("statsKey").forall(_ == sk),
        s"table at $root already declares statsKey=${hdr("statsKey")}")
    }
  }

  override def toString: String = s"SnapshotSink[$root]"
}
