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
    // AUTO-MAINTENANCE (Delta's auto-optimize slot): every
    // `maintainEvery` batches the sink runs [[Layout.snapshotMaintain]]
    // on its own table — possible precisely because the epoch-header
    // commit tolerates the interleaved compaction version
    val maintainEvery = parameters.get("maintainEvery").map(_.toInt)
    maintainEvery.foreach(n => require(n > 0, "maintainEvery must be > 0"))
    val policy = Layout.MaintenancePolicy(
      targetFileBytes = parameters.get("maintainTargetBytes")
        .map(_.toLong).getOrElse(128L << 20),
      maxDeleteFiles = parameters.get("maintainMaxDeleteFiles")
        .map(_.toInt).getOrElse(4),
      maxSmallFiles = parameters.get("maintainMaxSmallFiles")
        .map(_.toInt).getOrElse(16),
      smallFileBytes = parameters.get("maintainSmallFileBytes")
        .map(_.toLong).getOrElse(-1L),
      retentionMillis = parameters.get("maintainRetentionMillis")
        .map(_.toLong).getOrElse(7L * 24 * 3600 * 1000),
      minKeepVersions = parameters.get("maintainMinKeepVersions")
        .map(_.toInt).getOrElse(2),
      zOrderBy = parameters.get("maintainZOrderBy").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        .map(org.apache.spark.sql.functions.col),
      zQuantile = parameters.get("maintainZQuantile").exists(_.toBoolean))
    new SnapshotSink(sqlContext, root, ckpt,
      parameters.get("statsKey"),
      parameters.get("appendToExisting").exists(_.toBoolean),
      maintainEvery, policy)
  }
}

class SnapshotSink(sqlContext: SQLContext, root: String, ckptDir: String,
    statsKey: Option[String], appendToExisting: Boolean = false,
    maintainEvery: Option[Int] = None,
    policy: Layout.MaintenancePolicy = Layout.MaintenancePolicy())
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
    Layout.snapshotAppendEpoch(spark, root, batch, batchId,
      writerId = writerId, appendToExisting = appendToExisting,
      statsKey = statsKey)
    // cadence-gated auto-maintenance: a replayed batch re-running it is
    // harmless — maintenance converges (below-threshold heads no-op)
    maintainEvery.foreach { n =>
      if (batchId % n == n - 1) Layout.snapshotMaintain(spark, root, policy)
    }
  }

  override def toString: String = s"SnapshotSink[$root]"
}
