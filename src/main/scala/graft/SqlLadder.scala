package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.ops.{Layout, Relational}

/** SCALE-LADDER CALIBRATION for the SQL table layer: runs the manifest-
  * planned SQL path's headline shapes — q98 (pruned SQL range read),
  * q100 (DPP star join), q102 (partition overwrite read), q104
  * (days-transform DPP star join), and the MV rewrite — at each
  * available SF, recording wall seconds, PLANNED vs TOTAL files per
  * graft scan, and planned bytes. The point is the CURVE: work should
  * track the pruned fraction, not the table size — the measured backing
  * for SURVEY §5's 100× claims.
  *
  * Run: `sbt "runMain graft.SqlLadder"` (quiet machine; second
  * iteration timed so table builds and codegen don't pollute).
  */
object SqlLadder {

  private def graftScans(df: DataFrame): Seq[graft.sources.GraftScan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: walk(s.plan)
      case other => other +: (other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk))
    }
    walk(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b.scan }
      .collect { case g: graft.sources.GraftScan => g }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s -> s"/root/testdata/$s")
      .filter(p => new java.io.File(p._2).isDirectory)

    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q98_sql_table" -> (Relational.q98SqlTable _),
      "q100_dpp_join" -> (Relational.q100DppJoin _),
      "q102_partition_overwrite" -> (Relational.q102PartitionOverwrite _),
      "q104_transform_star_join" -> (Relational.q104TransformStarJoin _))

    println("| sf | query | sec | files planned/total | planned MB |")
    println("| --- | --- | --- | --- | --- |")
    for ((sf, dir) <- sfs) {
      // fresh session per rung: catalog plugin instances cache per
      // session, and each rung's builders point the same catalog names
      // at a different warehouse root
      val s = spark.newSession()
      s.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
      for ((name, fn) <- queries) {
        fn(s, dir).collect() // build tables + warm
        val t0 = System.nanoTime()
        val df = fn(s, dir)
        df.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val scans = graftScans(df)
        val files = scans
          .map(g => s"${g.lastPlannedFiles}/${g.totalFilesVisible}")
          .mkString(" + ")
        val mb = scans.map(_.lastPlannedBytes).sum / 1e6
        println(f"| $sf | $name | $sec%.2f | $files | $mb%.1f |")
      }
    }

    // MV rewrite: grouped agg answered from the rollup vs the base scan
    for ((sf, dir) <- sfs) {
      val s = spark.newSession() // fresh catalog cache per rung
      val wh = java.nio.file.Files
        .createTempDirectory(s"graft-ladder-mv-$sf").toString
      val base = Tables(s, dir, "orders")
        .select(org.apache.spark.sql.functions.col("o_orderkey").as("k"),
          org.apache.spark.sql.functions.col("o_orderstatus").as("cat"),
          org.apache.spark.sql.functions.col("o_totalprice")
            .cast("double").as("price"))
      Layout.snapshotAppend(s, s"$wh/base", base)
      Layout.maintainSumView(s, s"$wh/base", s"$wh/view", "cat", "price")
      s.conf.set("spark.sql.catalog.gladder",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gladder.root", wh)
      // SAME SQL text both ways; only the registry differs — the timing
      // isolates the rewrite, not a Scala-vs-SQL path difference
      def sqlAgg() = s.sql(
        "SELECT cat, sum(price) AS s, count(*) AS n " +
          "FROM gladder.base GROUP BY cat")
      def timeIt(): Double = {
        sqlAgg().collect() // warm
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); sqlAgg().collect()
          (System.nanoTime() - t0) / 1e9
        }
        t.min
      }
      graft.plans.MvRewriteRule.clear()
      val baseSec = timeIt()
      graft.plans.MvRewriteRule.register(s"$wh/base", s"$wh/view",
        "cat", "price")
      try {
        val mvSec = timeIt()
        val rewrote = !sqlAgg().queryExecution.optimizedPlan.toString
          .contains("RelationV2")
        println(f"| $sf | mv_rewrite | base=$baseSec%.2f view=$mvSec%.2f " +
          f"| rewrote=$rewrote | speedup=${baseSec / mvSec}%.1fx |")
      } finally graft.plans.MvRewriteRule.clear()
    }
    spark.stop()
  }
}
