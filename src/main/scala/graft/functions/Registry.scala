package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for graft's native expressions: after
  * `GraftFunctions.register(spark)`, plain SQL can call them —
  * `SELECT charfold(text), shingle_hashes(text) FROM docs` — putting the
  * portable-hash library on equal footing with built-ins for SQL users.
  */
object GraftFunctions {

  private def one(e: Seq[Expression]): Expression = {
    require(e.length == 1, s"expected exactly 1 argument, got ${e.length}")
    e.head
  }
  private def two(e: Seq[Expression]): (Expression, Expression) = {
    require(e.length == 2, s"expected exactly 2 arguments, got ${e.length}")
    (e.head, e(1))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("charfold",
      e => CharFoldExpr(one(e)), "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      e => ShingleHashesExpr(one(e)), "built-in")
    reg.createOrReplaceTempFunction("string_shingles",
      e => StringShinglesExpr(one(e)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      e => MinHashSigExpr(one(e), 128), "built-in")
    reg.createOrReplaceTempFunction("simhash_bits",
      e => SimHashBitsExpr(one(e), 48), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      e => { val (a, b) = two(e); DotProductExpr(a, b) }, "built-in")
    reg.createOrReplaceTempFunction("hamming",
      e => { val (a, b) = two(e); HammingExpr(a, b) }, "built-in")
    reg.createOrReplaceTempFunction("hyperplane_bucket",
      e => HyperplaneBucketExpr(one(e), 8, 64), "built-in")
    // The typed-Aggregator sketches as SQL aggregates (udaf registration —
    // the supported path for Aggregators): fixed default geometries, since
    // SQL function signatures can't carry constructor parameters. Scala
    // callers needing other geometries use the object factories directly.
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("misra_gries",
      udaf(new MisraGriesAggregator(32)))
    spark.udf.register("count_min",
      udaf(new CountMinAggregator(CountMinSketch.Depth, CountMinSketch.Width)))
    spark.udf.register("kll_quartiles",
      udaf(new KllAggregator(QuantileSketch.Cap, Seq(0.25, 0.5, 0.75))))
    spark.udf.register("kmv_sketch",
      udaf(new KmvAggregator(KmvSketch.K)))
  }
}

/** Conf-activatable extensions entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and every new session gets the
  * graft SQL functions without calling [[GraftFunctions.register]] — the
  * standard way a library ships Catalyst additions.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo(classOf[GraftExtensions].getName, name)
    ext.injectFunction((FunctionIdentifier("charfold"), info("charfold"),
      (e: Seq[Expression]) => CharFoldExpr(e.head)))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"), info("shingle_hashes"),
      (e: Seq[Expression]) => ShingleHashesExpr(e.head)))
    ext.injectFunction((FunctionIdentifier("string_shingles"), info("string_shingles"),
      (e: Seq[Expression]) => StringShinglesExpr(e.head)))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (e: Seq[Expression]) => MinHashSigExpr(e.head, 128)))
    ext.injectFunction((FunctionIdentifier("simhash_bits"), info("simhash_bits"),
      (e: Seq[Expression]) => SimHashBitsExpr(e.head, 48)))
    ext.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (e: Seq[Expression]) => DotProductExpr(e.head, e(1))))
    ext.injectFunction((FunctionIdentifier("hamming"), info("hamming"),
      (e: Seq[Expression]) => HammingExpr(e.head, e(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_bucket"), info("hyperplane_bucket"),
      (e: Seq[Expression]) => HyperplaneBucketExpr(e.head, 8, 64)))
    // sketch aggregates, same default geometries as GraftFunctions.register
    // (an Aggregator reaches SQL as the ScalaAggregator expression its
    // udaf-built Column carries — unwrapped via the package bridge)
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.udaf
    def one(e: Seq[Expression]): Expression = {
      require(e.length == 1, s"expected exactly 1 argument, got ${e.length}")
      e.head
    }
    ext.injectFunction((FunctionIdentifier("misra_gries"), info("misra_gries"),
      (e: Seq[Expression]) => GraftColumnBridge.expression(
        udaf(new MisraGriesAggregator(32)).apply(GraftColumnBridge.column(one(e))))))
    ext.injectFunction((FunctionIdentifier("count_min"), info("count_min"),
      (e: Seq[Expression]) => GraftColumnBridge.expression(
        udaf(new CountMinAggregator(CountMinSketch.Depth, CountMinSketch.Width))
          .apply(GraftColumnBridge.column(one(e))))))
    ext.injectFunction((FunctionIdentifier("kll_quartiles"), info("kll_quartiles"),
      (e: Seq[Expression]) => GraftColumnBridge.expression(
        udaf(new KllAggregator(QuantileSketch.Cap, Seq(0.25, 0.5, 0.75)))
          .apply(GraftColumnBridge.column(one(e))))))
    ext.injectFunction((FunctionIdentifier("kmv_sketch"), info("kmv_sketch"),
      (e: Seq[Expression]) => GraftColumnBridge.expression(
        udaf(new KmvAggregator(KmvSketch.K))
          .apply(GraftColumnBridge.column(one(e))))))
    // optimizer: nested-loop range joins → bucketed equi-joins, gated on
    // spark.graft.rangeJoin.width (see graft.plans.BucketedRangeJoinRule)
    ext.injectOptimizerRule(s => graft.plans.BucketedRangeJoinRule(s))
    ext.injectOptimizerRule(s => graft.plans.MvRewriteRule(s))
    // SQL MERGE INTO on graft catalog tables → the pruned snapshot COW
    // merge engine (see graft.plans.GraftMergeRule). WITH SCHEMA
    // EVOLUTION needs no extra rule: GraftTable declares
    // AUTOMATIC_SCHEMA_EVOLUTION, so Spark's own
    // ResolveMergeIntoSchemaEvolution widens the target through
    // GraftCatalog.alterTable (metadata-only ADD COLUMN) first
    ext.injectPostHocResolutionRule(s => graft.plans.GraftMergeRule(s))
  }
}
