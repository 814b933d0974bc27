package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation — the `Aggregator`/`TypedColumn` surface
  * (the (b) tier of the extension preference order, next to the codegen
  * `Expression`s): weighted mean over (value, weight) pairs.
  *
  * Scale shape: `reduce` runs map-side per partition and `merge`
  * combines the two-double buffers — the same partial-aggregation
  * contract a built-in agg gets, so the shuffle carries one 16-byte
  * buffer per group per task regardless of input size. */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  // zero summed weight (empty group / cancelling weights) → NaN, not 0.0:
  // a degenerate group must stay distinguishable from a true zero mean
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
