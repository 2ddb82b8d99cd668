package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate via the public Aggregator API (SURVEY §2.2 q36):
  * geometric mean as exp(mean(ln x)). Demonstrates the user-facing way to
  * add aggregate functions (buffer is a (Σln, n) pair — partial-aggregates
  * map-side like any built-in agg).
  */
object GeomMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form, usable in agg(). */
  def column(c: Column): Column = udaf(GeomMean).apply(c)
}
