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
}
