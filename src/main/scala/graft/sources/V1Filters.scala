package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._

/** V1 [[Filter]] → [[Column]] translation for the library's V1-path
  * relations (the MOR fallback scan, `format("graft")`): pushed
  * predicates re-apply INSIDE the relation's DataFrame plan, where they
  * reach the parquet reader as row-group pruning and (on snapshot
  * tables) the manifest layer as file pruning. Translation is
  * best-effort and ADVISORY only — every relation declares all filters
  * unhandled, so Spark re-evaluates the full predicate above the scan.
  *
  * POLARITY RULE: a pushed predicate may only WEAKEN the original
  * (every row the true predicate accepts must pass it). Dropping an
  * untranslatable conjunct weakens (A∧B → A ✓), also inside OR
  * ((A∧B)∨C → A∨C ✓) — but under NOT the polarity flips (¬(A∧B) → ¬A
  * would DROP rows ¬B∧A the true predicate keeps), so a negation
  * translates only when its child translates EXACTLY.
  */
private[graft] object V1Filters {

  private def c(name: String): Column = col(s"`$name`")

  private def leaf(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(c(a) === lit(v))
    case EqualNullSafe(a, v) => Some(c(a) <=> lit(v))
    case GreaterThan(a, v) => Some(c(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
    case LessThan(a, v) => Some(c(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(c(a) <= lit(v))
    case In(a, vs) => Some(c(a).isin(vs.toIndexedSeq.map(lit): _*))
    case IsNull(a) => Some(c(a).isNull)
    case IsNotNull(a) => Some(c(a).isNotNull)
    case StringStartsWith(a, p) => Some(c(a).startsWith(p))
    case StringEndsWith(a, p) => Some(c(a).endsWith(p))
    case StringContains(a, p) => Some(c(a).contains(p))
    case _ => None
  }

  /** COMPLETE translation or nothing — the only form sound under NOT. */
  private def exact(f: Filter): Option[Column] = f match {
    case And(l, r) => for (a <- exact(l); b <- exact(r)) yield a && b
    case Or(l, r) => for (a <- exact(l); b <- exact(r)) yield a || b
    case Not(child) => exact(child).map(not)
    case other => leaf(other)
  }

  /** EXACT (lossless) translation — `None` unless every leaf
    * translates. This is what a row-MUTATING consumer (DELETE) must
    * use: the weakening form below keeps partial conjunctions, which is
    * sound for a scan filter (rows re-checked upstream) but would
    * over-delete.
    */
  def exactColumn(f: Filter): Option[Column] = exact(f)

  /** Best-effort WEAKENING translation (see polarity rule above). */
  def toColumn(f: Filter): Option[Column] = f match {
    case And(l, r) =>
      (toColumn(l), toColumn(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (x, None) => x
        case (None, y) => y
      }
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(child) => exact(child).map(not)
    case other => leaf(other)
  }

  /** The conjunction of every translatable filter — `None` when nothing
    * translates (scan unfiltered; Spark's own Filter node does the work).
    */
  def conjunctionOf(filters: Seq[Filter]): Option[Column] =
    filters.flatMap(toColumn).reduceOption(_ && _)

  /** Total bytes of a snapshot's data files — the `sizeInBytes` a
    * V1-path relation reports so Spark's join planner can BROADCAST a
    * small table instead of assuming the unknowable-huge default. One
    * `listStatus` per distinct parent directory (a commit's data dir),
    * not one RPC per file.
    */
  def bytesOf(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.map(p => new org.apache.hadoop.fs.Path(p))
      .groupBy(_.getParent).iterator.map { case (parent, ps) =>
        val names = ps.map(_.getName).toSet
        parent.getFileSystem(conf).listStatus(parent)
          .filter(st => names.contains(st.getPath.getName))
          .map(_.getLen).sum
      }.sum
  }
}
