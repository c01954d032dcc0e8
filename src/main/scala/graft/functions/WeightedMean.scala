package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator UDAF — the reference's compiled-UDAF surface
  * (bodo/libs/groupby/_groupby_udf.h, `udf`/`gen_udf` ftypes in
  * _groupby_ftypes.h:22): weighted mean Σwx/Σw with a (Σwx, Σw) buffer.
  * Registered through `udaf()` so both the DSL and SQL can call it; the
  * reduce/merge split gives the same partial-aggregation plan shape as a
  * builtin sum.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register `wmean(value, weight)` in the session — truly idempotent
    * (skip when present; re-registration warns into every session log). */
  def register(spark: SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("wmean")
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.udf.register("wmean", udaf(WeightedMean)): Unit
  }
}
