package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The `bucket(n, col)` V2 FUNCTION — what makes BUCKETED
  * storage-partitioned joins resolvable: Spark's
  * `V2ScanPartitioningAndOrdering` turns a scan-reported
  * `KeyGroupedPartitioning(bucket(n, col))` into a catalyst
  * `TransformExpression` only if the table's catalog
  * ([[GraftCatalog]], a `FunctionCatalog`) can load and bind the named
  * function; two scans whose transforms bind to the SAME canonical
  * function with the same bucket count are then co-partitioned and
  * their join plans with NO shuffle on either side.
  *
  * Semantics are [[graft.ops.PartSpec.Bucket]]'s, BY CONSTRUCTION: the
  * bound function evaluates the very catalyst expression the write
  * side records with — `pmod(xxhash64(value, seed 42), n)` — so a
  * bucket id computed here can never disagree with a manifest-recorded
  * one.
  */
class GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(xxhash64(col), n) — graft's layout hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket expects (int numBuckets, value); got $inputType")
    new GraftBucketBound(inputType.fields(1).dataType)
  }
}

class GraftBucketBound(valueType: DataType)
    extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  // the equality SPJ compares across the two join sides
  override def canonicalName(): String = s"graft.bucket($valueType)"
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def isDeterministic: Boolean = true

  // the SAME hash expression PartSpec's write side records with
  @transient private lazy val hash =
    XxHash64(Seq(BoundReference(1, valueType, nullable = true)), 42L)

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val h = hash.eval(input).asInstanceOf[Long]
    Integer.valueOf(Math.floorMod(h, n.toLong).toInt)
  }
}

/** `days(ts)` / `hours(ts)` as V2 functions — the temporal twins of
  * [[GraftBucketUnbound]]: two tables `PARTITIONED BY (days(ts))`
  * joined on the raw timestamp co-partition by epoch day and the join
  * plans exchange-free (the q104 star-join shape with the fact-side
  * shuffle removed by layout). The bound form evaluates
  * [[graft.ops.PartSpec.rawTransformExpr]] — the exact write-side
  * recording expression (epoch floor-division on internal
  * micros/days), so a plan-time day id always equals the
  * manifest-recorded one.
  */
class GraftTemporalUnbound(fn: String) extends UnboundFunction {
  override def name(): String = fn
  override def description(): String =
    s"$fn(ts): epoch-${fn.stripSuffix("s")} floor — graft's layout unit"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$fn expects one DATE/TIMESTAMP argument; got $inputType")
    val bound = new GraftTemporalBound(fn, inputType.fields(0).dataType)
    // type-check EAGERLY: bind is the analysis-time contract — a
    // wrong-typed argument must refuse here, not crash per-task when
    // the lazy expression first evaluates on an executor
    bound.validate()
    bound
  }
}

class GraftTemporalBound(fn: String, valueType: DataType)
    extends ScalarFunction[Integer] {
  import graft.ops.PartSpec
  override def name(): String = fn
  override def canonicalName(): String = s"graft.$fn($valueType)"
  override def inputTypes(): Array[DataType] = Array(valueType)
  override def resultType(): DataType = IntegerType
  override def isDeterministic: Boolean = true

  private def buildExpr = {
    val dim = if (fn == "days") PartSpec.Days(0, "c")
              else PartSpec.Hours(0, "c")
    PartSpec.rawTransformExpr(dim,
      BoundReference(0, valueType, nullable = true), valueType)
      .getOrElse(throw new UnsupportedOperationException(
        s"$fn does not apply to $valueType (days needs DATE/TIMESTAMP, " +
          "hours needs TIMESTAMP)"))
  }

  /** Analysis-time type check — called from bind. */
  private[sources] def validate(): Unit = buildExpr

  @transient private lazy val expr = buildExpr

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(0)) return null
    expr.eval(input) match {
      case l: java.lang.Long => Integer.valueOf(l.toInt)
      case i: java.lang.Integer => i
      case other => Integer.valueOf(String.valueOf(other).toInt)
    }
  }
}
