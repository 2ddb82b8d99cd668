package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.Layout

/** Test probe: build the DSv2 scan for a table head and read back its
  * optimizer-visible per-column distinct counts.
  */
class GraftScanBuilderProbe(spark: SparkSession, root: String) {
  def columnStats(): Map[String, Long] = stats()._2

  def numRows(): Option[Long] = stats()._1

  /** Build the scan with `filters` pushed (what a WHERE clause delivers)
    * and read back (numRows, per-column NDV) — the base statistics the
    * optimizer sees for a FILTERED scan.
    */
  def stats(filters: Seq[org.apache.spark.sql.catalyst.expressions
      .Expression] = Nil): (Option[Long], Map[String, Long]) = {
    val schema = Layout.readSnapshot(spark, root).schema
    val sb = new GraftScanBuilder(root, "probe", -1, schema,
      CaseInsensitiveStringMap.empty())
    if (filters.nonEmpty) sb.pushFilters(filters)
    val scan = sb.build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics]
    import scala.jdk.CollectionConverters._
    val st = scan.estimateStatistics()
    val rows = if (st.numRows().isPresent) Some(st.numRows().getAsLong)
      else None
    (rows, st.columnStats().asScala.map {
      case (ref, cs) => ref.fieldNames().mkString(".") ->
        cs.distinctCount().orElse(-1L)
    }.toMap)
  }
}
