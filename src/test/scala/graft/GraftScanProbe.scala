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

  /** The merged equi-height histogram the scan reports for `col`:
    * (height, bins as (lo, hi, ndv)), plus the reported min/max.
    */
  def histogram(col: String): Option[(Double, Seq[(Double, Double, Long)],
      Option[Any], Option[Any])] = {
    val schema = Layout.readSnapshot(spark, root).schema
    val sb = new GraftScanBuilder(root, "probe", -1, schema,
      CaseInsensitiveStringMap.empty())
    val scan = sb.build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics]
    import scala.jdk.CollectionConverters._
    scan.estimateStatistics().columnStats().asScala.collectFirst {
      case (ref, cs) if ref.fieldNames().mkString(".") == col &&
          cs.histogram().isPresent =>
        val h = cs.histogram().get()
        (h.height(), h.bins().toSeq.map(b => (b.lo(), b.hi(), b.ndv())),
          if (cs.min().isPresent) Some(cs.min().get()) else None,
          if (cs.max().isPresent) Some(cs.max().get()) else None)
    }
  }
}
