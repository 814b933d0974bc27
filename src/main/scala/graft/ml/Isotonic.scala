package graft.ml

import org.apache.spark.ml.regression.IsotonicRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monotone (isotonic) calibration — the step that turns a raw heuristic
  * score into a calibrated probability while preserving order, run after
  * every learned quality gate (a classifier's scores rank well but their
  * magnitudes drift; PAVA fixes magnitude without disturbing rank).
  *
  * The query-surface fit ([[calibrateReturns]]) uses the MINIMAX
  * characterization of the unique weighted-L2 isotonic solution,
  *
  *   fit(i) = max_{j ≤ i} min_{k ≥ i} avg(j..k),
  *
  * evaluated ENTIRELY in integer arithmetic: every block average is the
  * rational (Σ n_r)/(Σ n), and because floor commutes with min/max
  * (floor is monotone, and a monotone image of a set's min IS the min of
  * the image), taking each candidate average as floor-ppm and then
  * max∘min over BIGINTs yields exactly floor-ppm of the true PAVA
  * solution. No float appears anywhere, so the DuckDB oracle certifies
  * the fit bit-for-bit — this was the repo's last rows-only calibration
  * readout (r9 task 7). The O(m³) minimax is domain-bounded: m =
  * |distinct l_quantity| (~50 at every SF), evaluated as two joins over
  * prefix sums. [[calibrateReturnsSolver]] keeps the spark.ml PAVA
  * solver as the spec's independent referee.
  */
object Isotonic {

  /** Aggregated (qty, n, n_r) points — ONE map-side-combined agg to
    * |distinct quantity| rows; everything after is domain-bounded. */
  private def points(spark: SparkSession, d: String): DataFrame =
    graft.Tables.lineitem(spark, d)
      .groupBy(col("l_quantity").as("qty"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_r"))

  /** Calibrate P(returnflag = 'R' | quantity) over lineitem: raw
    * per-quantity return rates are noisy and non-monotone; the isotonic
    * fit is the best monotone approximation under the per-point counts
    * as weights. Readout in exact integer ppm (see object doc).
    *
    * 100 TB shape: one partial agg to the m-row domain frame; the
    * minimax runs on m³ ≈ 10⁵ bounded work. */
  def calibrateReturns(spark: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("qty") // m-row bounded frame: single partition is fine
    val cum = points(spark, d)
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cn", sum("n").over(w))
      .withColumn("cr", sum("n_r").over(w))
    // prefix rows (j, cn_{j-1}, cr_{j-1}): block j..k sums are cum diffs
    val pre = cum.select((col("i") + 1L).as("j"),
        col("cn").as("cnp"), col("cr").as("crp"))
      .unionByName(cum.sparkSession.range(1).select(
        lit(1L).as("j"), lit(0L).as("cnp"), lit(0L).as("crp")))
    val ratios = pre.join(
        cum.select(col("i").as("k"), col("cn").as("cnk"), col("cr").as("crk")),
        col("k") >= col("j"))
      .select(col("j"), col("k"),
        expr("((crk - crp) * 1000000) div (cnk - cnp)").as("ppm"))
    val fit = cum.select(col("i"))
      .join(ratios, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min("ppm").as("mn"))
      .groupBy("i").agg(max("mn").as("calibrated_ppm"))
    cum.join(fit, "i")
      .select(col("qty"), col("n"), col("n_r"),
        expr("(n_r * 1000000) div n").as("raw_rate_ppm"),
        col("calibrated_ppm"))
      .orderBy("qty")
  }

  /** spark.ml's pool-adjacent-violators solver on the same points —
    * the independent referee IsotonicSpec checks [[calibrateReturns]]
    * against (PAVA's solution is unique, so they must agree to within
    * the ppm quantization). */
  def calibrateReturnsSolver(spark: SparkSession, d: String): DataFrame = {
    val pts = points(spark, d)
      .withColumn("rate", col("n_r").cast("double") / col("n"))
    val model = new IsotonicRegression()
      .setFeaturesCol("qty").setLabelCol("rate").setWeightCol("w")
      .fit(pts.select(col("qty"), col("rate"), col("n").cast("double").as("w")))
    model.transform(pts)
      .select(col("qty"), col("n"), col("n_r"), col("rate").as("raw_rate"),
        col("prediction").as("calibrated"))
      .orderBy("qty")
  }
}
