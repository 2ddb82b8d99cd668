package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for graft's native expressions: after
  * `GraftFunctions.register(spark)`, plain SQL can call them —
  * `SELECT charfold(text), shingle_hashes(text) FROM docs` — putting the
  * portable-hash library on equal footing with built-ins for SQL users.
  */
object GraftFunctions {

  private def one(e: Seq[Expression]): Expression = e.head
  private def two(e: Seq[Expression]): (Expression, Expression) = (e.head, e(1))

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
  }
}
