package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.zvalue

/** Physical-layout operators: how a 100 TB table gets WRITTEN so that
  * later scans can skip most of it. Query operators assume the engine
  * prunes; these produce the layouts that make pruning possible.
  */
object Layout {

  /** Z-order clustered write (the `OPTIMIZE ZORDER BY` slot): scale each
    * clustering column to [0, 2^bits) by min-max binning (one agg pass —
    * broadcast as literals), interleave the bits into a Morton z-value,
    * range-partition + sort by it, and write with bounded file size. Every
    * output file then covers a small hyper-rectangle of the clustered
    * space, so parquet min-max footer stats skip files/row-groups for
    * predicates on ANY clustered column — a single-column sort only ever
    * skips on its own column. Linear binning is the deterministic choice;
    * a skewed production domain substitutes quantile ranks (range
    * partition ids) per column — the z-value arithmetic is unchanged.
    * 100 TB: one extra shuffle at write time (the range partitioning); the
    * payoff is every subsequent scan. `maxRecordsPerFile` bounds file
    * granularity — skipping resolution IS file resolution.
    */
  def zOrderWrite(df: DataFrame, zcols: Seq[Column], path: String,
      bits: Int = 16, partitions: Int = 8, maxRecordsPerFile: Long = 0L): Unit = {
    val aggs = zcols.zipWithIndex.flatMap { case (c, k) =>
      Seq(min(c.cast("long")).as(s"mn$k"), max(c.cast("long")).as(s"mx$k"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = zcols.zipWithIndex.map { case (c, k) =>
      val mn = stats.getLong(2 * k)
      val mx = stats.getLong(2 * k + 1)
      // monotone integer binning onto [0, 2^bits); +1 keeps mx in range
      ((c.cast("long") - lit(mn)) * lit(1L << bits) / lit(mx - mn + 1))
        .cast("long")
    }
    df.withColumn("__zv", zvalue(bits, scaled: _*))
      .repartitionByRange(partitions, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  case class CompactStats(filesBefore: Int, filesAfter: Int, bytesBefore: Long)

  /** Small-file compaction (the `OPTIMIZE` slot): bin-pack a directory of
    * many small parquet files into ~[[targetBytes]]-sized ones. Streaming
    * sinks and fine-grained ingests leave thousands of KB-scale files per
    * partition; at 100 TB that means a scan pays one open/footer-read per
    * tiny file and the NameNode/listing layer drowns — compaction is the
    * standing maintenance job every table format schedules.
    *
    * Two modes, chosen by whether the caller wants clustering back:
    *  - plain: ZERO-SHUFFLE — the scan itself is the bin-packer. Spark's
    *    file source first-fit-packs whole small files into read splits of
    *    up to `spark.sql.files.maxPartitionBytes`; setting that to the
    *    target size (and the open-cost padding to 0) makes each read task
    *    a ~targetBytes bin, and the write emits one file per task. No
    *    coalesce arithmetic, no shuffle, no row movement between
    *    executors beyond the file reads themselves.
    *  - clustered: `repartitionByRange(n, cols) + sortWithinPartitions`,
    *    n = ⌈input bytes / targetBytes⌉ — one range shuffle that
    *    re-establishes non-overlapping per-file key ranges, so footer
    *    min-max pruning works again after the compaction (appends
    *    interleave ranges; plain concat would keep the overlap).
    * Sizing reads the REAL listing, not a row-count guess, so compression
    * ratio drift cancels out.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long,
      clusterBy: Seq[Column] = Nil): CompactStats = {
    val hconf = spark.sessionState.newHadoopConf()
    def list(dir: String) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(hconf).listStatus(p)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }
    val before = list(inPath)
    val total = before.map(_.getLen).sum
    val conf = spark.conf
    val oldMax = conf.get("spark.sql.files.maxPartitionBytes")
    val oldOpen = conf.get("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      conf.set("spark.sql.files.openCostInBytes", "0")
      val df = spark.read.parquet(inPath)
      val packed =
        if (clusterBy.isEmpty) df
        else {
          val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
          df.repartitionByRange(n, clusterBy: _*)
            .sortWithinPartitions(clusterBy: _*)
        }
      packed.write.mode("overwrite").parquet(outPath)
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      conf.set("spark.sql.files.openCostInBytes", oldOpen)
    }
    CompactStats(before.length, list(outPath).length, total)
  }
}
