package graft.ml

import org.apache.spark.ml.regression.IsotonicRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Monotone (isotonic) calibration via spark.ml's pool-adjacent-
  * violators solver — the step that turns a raw heuristic score into a
  * calibrated probability while preserving order, run after every
  * learned quality gate (a classifier's scores rank well but their
  * magnitudes drift; PAVA fixes magnitude without disturbing rank).
  *
  * PAVA's solution is UNIQUE for a given weighted point set, so the
  * whole operator is deterministic end to end: the input here is the
  * aggregated (x, rate, weight) frame — one point per distinct x — and
  * spark.ml solves it exactly (parallel PAVA per partition + driver
  * merge; the aggregated frame is domain-bounded, so the driver step is
  * O(|x|), input-size-free).
  */
object Isotonic {

  /** Calibrate P(returnflag = 'R' | quantity) over lineitem: raw
    * per-quantity return rates are noisy and non-monotone; the isotonic
    * fit is the best monotone approximation under the per-point counts
    * as weights (larger quantities ship longer and get returned more —
    * the monotone prior).
    *
    * 100 TB shape: ONE map-side-combined agg to |distinct quantity|
    * points; the PAVA fit and the prediction join run on that
    * domain-bounded frame. */
  def calibrateReturns(spark: SparkSession, d: String): DataFrame = {
    val pts = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_quantity").as("qty"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_r"))
      .withColumn("rate", col("n_r").cast("double") / col("n"))
    val model = new IsotonicRegression()
      .setFeaturesCol("qty").setLabelCol("rate").setWeightCol("w")
      .fit(pts.select(col("qty"), col("rate"), col("n").cast("double").as("w")))
    model.transform(pts.select(col("qty"), col("n"), col("n_r"), col("rate")))
      .select(col("qty"), col("n"), col("n_r"),
        round(col("rate"), 6).as("raw_rate"),
        round(col("prediction"), 6).as("calibrated"))
      .orderBy("qty")
  }
}
