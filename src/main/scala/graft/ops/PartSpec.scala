package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Cast, DateDiff, Expression,
  If, IntegralDivide, IsNull, Literal, Pmod, Subtract, XxHash64}
import org.apache.spark.sql.types._

/** PARTITION TRANSFORMS + MULTI-COLUMN PARTITIONING — the Iceberg idea
  * of a declared `PARTITIONED BY (days(ts), bucket(16, key))` spec,
  * carried as the `partSpec` table property and recorded per file in
  * the manifest as DIMENSION-PREFIXED transformed value sets
  * (`"<dim>:<value>"` strings riding the existing `parts` slot).
  *
  * Supported transforms (spec grammar, comma-separated dims):
  *  - `identity(c)` — the raw value (multi-column identity layouts);
  *  - `days(c)` — epoch days (floor) of a DATE/TIMESTAMP column;
  *  - `hours(c)` — epoch hours (floor) of a TIMESTAMP column;
  *  - `bucket(n, c)` — `pmod(xxhash64(c), n)`, the hash-bucket layout;
  *  - `truncate(w, c)` — leading `w` characters of a STRING column.
  *
  * ONE TRANSLATION, TWO CALLERS — the soundness invariant: the write
  * side ([[Layout]]'s commit stats pass) and the prune side
  * ([[graft.sources.SnapshotFileIndex]], including DPP-delivered
  * runtime filters) both evaluate the SAME catalyst expression built
  * by [[transformExpr]] (the write side over the column, the prune
  * side over the predicate's literal), so a recorded value and a
  * query-side probe can never disagree on rounding, hashing, or
  * timezone handling (all arithmetic is timezone-free: epoch math on
  * the internal micros/days, xxhash64 on the raw value).
  *
  * Pruning semantics per dimension (per-dim necessary conditions of
  * the predicate — intersecting dims is sound because every dim's
  * restriction must hold for a row to match):
  *  - equality / IN on the source column → the file must record one of
  *    the transformed probe values in that dim;
  *  - range predicates on a MONOTONE dim (days/hours) → the file must
  *    record a dim value inside the transformed bound interval;
  *  - anything unprovable keeps the file (the partCol discipline).
  * NULL source values record the NUL sentinel, which no literal
  * probe ever equals — sentinel-only files prune under equality, stay
  * under ranges (conservative).
  *
  * 100 TB: `days(event_ts)` is how a telemetry corpus actually
  * partitions; DPP on a date-dim star join and static temporal slices
  * both prune to O(matching days' files) from manifest metadata alone.
  */
object PartSpec {

  /** The null-partition-value sentinel (shared with the partCol path). */
  val NullSentinel = "\u0000"

  sealed trait Dim {
    def idx: Int
    def col: String
    /** Transform preserves source order → range predicates map. */
    def monotone: Boolean
    /** Recorded values parse as longs (range tests compare numerically). */
    def numeric: Boolean
    def render: String
  }
  final case class Identity(idx: Int, col: String) extends Dim {
    val monotone = false; val numeric = false
    def render = s"identity($col)"
  }
  final case class Days(idx: Int, col: String) extends Dim {
    val monotone = true; val numeric = true
    def render = s"days($col)"
  }
  final case class Hours(idx: Int, col: String) extends Dim {
    val monotone = true; val numeric = true
    def render = s"hours($col)"
  }
  final case class Bucket(idx: Int, n: Int, col: String) extends Dim {
    val monotone = false; val numeric = true
    def render = s"bucket($n,$col)"
  }
  final case class Truncate(idx: Int, w: Int, col: String) extends Dim {
    val monotone = false; val numeric = false
    def render = s"truncate($w,$col)"
  }

  private val FnArg = """(\w+)\s*\(\s*([^()]+)\s*\)""".r

  /** Parse the `partSpec` property. Fails loudly on an unknown
    * transform — a silently-ignored dim would record nothing and prune
    * nothing while the user believes the layout is partitioned.
    */
  def parse(spec: String): Seq[Dim] =
    spec.split(",(?![^(]*\\))").toSeq.map(_.trim).filter(_.nonEmpty)
      .zipWithIndex.map {
        case (FnArg(fn, args), i) =>
          val as = args.split(",").map(_.trim)
          (fn.toLowerCase, as) match {
            case ("identity", Array(c)) => Identity(i, c)
            case ("days", Array(c)) => Days(i, c)
            case ("hours", Array(c)) => Hours(i, c)
            case ("bucket", Array(n, c)) if n.forall(_.isDigit) &&
                n.toInt > 0 => Bucket(i, n.toInt, c)
            case ("truncate", Array(w, c)) if w.forall(_.isDigit) &&
                w.toInt > 0 => Truncate(i, w.toInt, c)
            case _ => throw new IllegalArgumentException(
              s"unsupported partition transform '$fn($args)' — supported: " +
                "identity(c), days(c), hours(c), bucket(n,c), truncate(w,c)")
          }
        case (bare, i) => Identity(i, bare) // bare column = identity
      }

  def render(dims: Seq[Dim]): String = dims.map(_.render).mkString(",")

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** floor-division on catalyst longs: `(a - pmod(a, b)) div b` —
    * `pmod` is non-negative, so the quotient is the mathematical floor
    * (SQL `div` alone truncates toward zero, wrong for pre-epoch
    * values).
    */
  private def floorDiv(a: Expression, b: Long): Expression = {
    val bl = Literal(b, LongType)
    IntegralDivide(Subtract(a, Pmod(a, bl)), bl)
  }

  // TimestampType's internal value IS epoch micros — UnixMicros reads
  // it without any timezone interpretation
  private def micros(in: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.UnixMicros(in)

  /** The transformed value of `in` (typed `dt`) for `dim`, as a
    * catalyst expression yielding the RECORDED string — or None when
    * the column type doesn't fit the transform (declaration validation
    * refuses such specs; a legacy mismatch records nothing and prunes
    * nothing). Shared by the write-side commit pass (in = the column)
    * and the prune-side probe (in = a predicate literal).
    */
  /** The RAW transformed value of `in` (typed `dt`) for `dim` — the
    * pre-stringification expression shared by [[transformExpr]] and the
    * V2 layout functions ([[graft.sources.GraftBucketFunction]] and
    * kin), so a bucket/day id computed at PLAN time (SPJ transform
    * evaluation) is the very expression the WRITE side recorded with.
    */
  def rawTransformExpr(dim: Dim, in: Expression,
      dt: DataType): Option[Expression] = dim match {
    case _: Identity => Some(in)
    case _: Days => dt match {
      case DateType => Some(DateDiff(in, Literal(0, DateType)))
      case TimestampType => Some(floorDiv(micros(in), MicrosPerDay))
      case _ => None
    }
    case _: Hours => dt match {
      case TimestampType => Some(floorDiv(micros(in), MicrosPerHour))
      case _ => None
    }
    case b: Bucket =>
      // seed 42 = the SQL xxhash64() default, so `pmod(xxhash64(c), n)`
      // written in plain SQL produces identical buckets
      Some(Pmod(XxHash64(Seq(in), 42L), Literal(b.n.toLong, LongType)))
    case t: Truncate => dt match {
      case StringType => Some(
        org.apache.spark.sql.catalyst.expressions.Substring(in,
          Literal(1, IntegerType), Literal(t.w, IntegerType)))
      case _ => None
    }
  }

  def transformExpr(dim: Dim, in: Expression,
      dt: DataType): Option[Expression] =
    rawTransformExpr(dim, in, dt).map(r =>
      If(IsNull(in), Literal.create(NullSentinel, StringType),
        Cast(r, StringType)))

  /** Probe value: the recorded string a row with this literal value
    * would carry in `dim` — None when untranslatable (prunes nothing)
    * or the literal is NULL (`c = NULL` matches no row anyway).
    */
  def valueOf(dim: Dim, lit: Literal): Option[String] = {
    if (lit.value == null) return None
    transformExpr(dim, lit, lit.dataType).map { e =>
      String.valueOf(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty))
    }
  }

  /** Transformed bound for a MONOTONE dim: the source column's internal
    * long value `v` (micros for timestamp, days for date) maps to the
    * dim unit via the same floor arithmetic [[transformExpr]] applies.
    */
  def boundOf(dim: Dim, v: Long, dt: DataType): Option[Long] = dim match {
    case _: Days => dt match {
      case DateType => Some(v)
      case TimestampType => Some(Math.floorDiv(v, MicrosPerDay))
      case _ => None
    }
    case _: Hours => dt match {
      case TimestampType => Some(Math.floorDiv(v, MicrosPerHour))
      case _ => None
    }
    case _ => None
  }

  /** Declaration-time validation: every dim's column exists with a
    * transform-compatible type. Refuses loudly at CREATE, so a bad
    * spec never silently records nothing.
    */
  def validate(dims: Seq[Dim], schema: StructType,
      resolver: (String, String) => Boolean): Unit = dims.foreach { d =>
    val f = schema.fields.find(f => resolver(f.name, d.col)).getOrElse(
      throw new IllegalArgumentException(
        s"partition transform ${d.render} references no column '${d.col}'"))
    if (transformExpr(d, Literal.default(f.dataType), f.dataType).isEmpty)
      throw new IllegalArgumentException(
        s"partition transform ${d.render} does not apply to " +
          s"${f.dataType.simpleString} column '${f.name}' (days needs " +
          "DATE/TIMESTAMP, hours needs TIMESTAMP, truncate needs STRING)")
  }
}
