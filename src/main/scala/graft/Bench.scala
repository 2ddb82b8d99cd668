package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen paths once (scheduler, parquet reader,
    // whole-stage codegen compiler) so the first measured query isn't
    // charged the session's one-time costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Round-over-round regression guard: compare against the committed
    // anchor (tools/bench_anchor.json, round-1 numbers) and flag >1.5×
    // slowdowns loudly. Queries under 0.3 s anchor sit on the scheduler
    // floor and jitter freely — skipped. Reported, not fatal: the driver
    // must still receive the bench line.
    val regressions: Seq[String] = {
      val anchorFile = new java.io.File("tools/bench_anchor.json")
      if (!anchorFile.exists()) Nil
      else {
        val txt = scala.io.Source.fromFile(anchorFile).mkString
        val anchor = """"([a-z0-9_]+)":\s*([0-9.]+)""".r
          .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
        results.flatMap { case (name, sec) =>
          anchor.get(name).collect {
            case base if base >= 0.3 && sec > base * 1.5 =>
              f"$name: ${sec}%.2fs vs anchor ${base}%.2fs (${sec / base}%.1fx)"
          }
        }
      }
    }
    regressions.foreach(r => System.err.println(s"[bench] REGRESSION $r"))
    val regJson = regressions.map(r => "\"" + r + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"regressions":$regJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
