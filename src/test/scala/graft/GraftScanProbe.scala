package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.Layout

/** Test probe: build the DSv2 scan for a table head and read back its
  * optimizer-visible per-column distinct counts.
  */
class GraftScanBuilderProbe(spark: SparkSession, root: String) {
  def columnStats(): Map[String, Long] = {
    val schema = Layout.readSnapshot(spark, root).schema
    val scan = new GraftScanBuilder(root, "probe", -1, schema,
      CaseInsensitiveStringMap.empty()).build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics]
    import scala.jdk.CollectionConverters._
    scan.estimateStatistics().columnStats().asScala.map {
      case (ref, cs) => ref.fieldNames().mkString(".") ->
        cs.distinctCount().orElse(-1L)
    }.toMap
  }
}
