package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.ops.Layout

/** The PATH-BASED batch surface for the versioned table —
  * `format("graft")`, the Delta-format slot for code that works with
  * paths instead of a catalog:
  *
  * {{{
  * spark.read.format("graft").option("path", root).load()          // head
  *   .option("versionAsOf", "3")                                   // pin
  *   .option("timestampAsOf", "1723680000000")                     // as-of
  *   .option("changesFrom", "2")[.option("changesTo", "5")]        // CDC
  * df.write.format("graft").mode("append"|"overwrite")
  *   .option("path", root)[.option("statsKey", "k")].save()
  * }}}
  *
  * Reads resolve through the SAME engines as the catalog
  * ([[Layout.readSnapshot]] / [[Layout.readSnapshotAsOf]] /
  * [[Layout.snapshotChanges]] — sidecar-aware, never wrong); writes are
  * manifest commits ([[Layout.snapshotAppend]] /
  * [[Layout.snapshotOverwrite]]), never bare file drops. `changesFrom`
  * serves the op-typed feed (`_change_type` insert/delete/update pair), the batch
  * twin of the `graft-cdf` stream's cdc mode — `table_changes(...)`
  * without needing a TVF.
  */
class GraftRelationProvider extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") needs .option(\"path\", <snapshot table root>) " +
        "or load(<root>)"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    def bad(msg: String) = throw new IllegalArgumentException(
      s"format(\"graft\") at $root: $msg")
    val version = parameters.get("versionAsOf").map(_.toInt)
    val tsOf = parameters.get("timestampAsOf").map(_.toLong)
    val chFrom = parameters.get("changesFrom").map(_.toInt)
    val chTo = parameters.get("changesTo").map(_.toInt)
    if (Seq(version, tsOf, chFrom).flatten.size > 1)
      bad("versionAsOf, timestampAsOf and changesFrom are exclusive")
    if (chTo.isDefined && chFrom.isEmpty)
      bad("changesTo needs changesFrom")
    val df: DataFrame = (version, tsOf, chFrom) match {
      case (Some(v), _, _) => Layout.readSnapshot(spark, root, v)
      case (_, Some(ts), _) => Layout.readSnapshotAsOf(spark, root, ts)
      case (_, _, Some(from)) =>
        val to = chTo.getOrElse(Layout.snapshotVersions(spark, root).last)
        Layout.snapshotChanges(spark, root, from, to)
      case _ => Layout.readSnapshot(spark, root)
    }
    val ctx = sqlContext
    // PrunedFilteredScan: the projection and (translatable) predicates
    // re-apply INSIDE df's own plan, so they reach the parquet reader
    // (column skip, row-group pruning) and the manifest layer (file
    // pruning) instead of materializing every column of every row.
    // All filters stay "unhandled" (the default) — Spark re-evaluates
    // the full predicate above, so translation is pure optimization.
    // plain table reads (head / version / as-of) report their real byte
    // size so small tables broadcast in joins; the change feed keeps the
    // conservative default (its row volume is not the files' volume)
    val tableBytes: Option[Long] =
      if (chFrom.isDefined) None
      else Some(V1Filters.bytesOf(spark, df.inputFiles.toSeq))
    new BaseRelation with PrunedFilteredScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      override def sizeInBytes: Long =
        tableBytes.getOrElse(super.sizeInBytes)
      override def buildScan(requiredColumns: Array[String],
          filters: Array[Filter]): RDD[Row] = {
        val filtered = V1Filters.conjunctionOf(filters.toSeq)
          .map(df.filter).getOrElse(df)
        val projected =
          if (requiredColumns.isEmpty)
            // COUNT(*)-style scan: no columns needed, rows still counted
            filtered.select()
          else filtered.select(requiredColumns.toIndexedSeq
            .map(n => org.apache.spark.sql.functions.col(s"`$n`")): _*)
        projected.rdd
      }
    }
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val statsKey = parameters.get("statsKey")
    val clusterBy = parameters.get("clusterBy")
    mode match {
      case SaveMode.Append =>
        Layout.snapshotAppend(spark, root, data, statsKey = statsKey,
          clusterBy = clusterBy)
      case SaveMode.Overwrite =>
        Layout.snapshotOverwrite(spark, root, data)
      case SaveMode.ErrorIfExists =>
        if (Layout.snapshotVersions(spark, root).nonEmpty)
          throw new org.apache.spark.sql.catalyst.analysis
            .TableAlreadyExistsException(Seq(root))
        Layout.snapshotAppend(spark, root, data, statsKey = statsKey,
          clusterBy = clusterBy)
      case SaveMode.Ignore =>
        if (Layout.snapshotVersions(spark, root).isEmpty)
          Layout.snapshotAppend(spark, root, data, statsKey = statsKey,
            clusterBy = clusterBy)
    }
    createRelation(sqlContext, parameters)
  }
}
