package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.RFormula
import org.apache.spark.ml.regression.{GeneralizedLinearRegression, GeneralizedLinearRegressionModel}
import org.apache.spark.sql.DataFrame

/** Weighted Poisson GLM `goals ~ team + opponent` (SURVEY.md §2.9 M1/M2;
  * ml_project.py:211-212) on spark.ml: RFormula one-hot encodes the factor
  * columns, GeneralizedLinearRegression fits poisson/log via distributed
  * IRLS with a weight column (the freq_weights analog).
  *
  * Scale: IRLS is a handful of treeAggregate passes over the design
  * matrix — linear scale-out; the model (p coefficients) lives on the
  * driver. Coefficient parity with statsmodels is ~1e-4 and baseline-
  * category-sensitive, so tests compare predictions (λ), not raw
  * coefficients (SURVEY.md §7.4.4).
  */
object PoissonModel {

  case class Fitted(model: GeneralizedLinearRegressionModel, pipeline: org.apache.spark.ml.PipelineModel)

  /** Fit on a (goals, team, opponent[, weight]) frame. */
  def fit(data: DataFrame, formula: String = "goals ~ team + opponent",
          weightCol: Option[String] = Some("weight")): Fitted = {
    val rf = new RFormula().setFormula(formula)
      .setFeaturesCol("features").setLabelCol("label")
    val glr = new GeneralizedLinearRegression()
      .setFamily("poisson").setLink("log")
      .setFeaturesCol("features").setLabelCol("label")
      .setMaxIter(10).setTol(1e-8).setRegParam(0.0)
    weightCol.foreach(glr.setWeightCol)
    val pm = new Pipeline().setStages(Array(rf, glr)).fit(data)
    Fitted(pm.stages.last.asInstanceOf[GeneralizedLinearRegressionModel], pm)
  }

  /** Predicted rate λ for (team, opponent) rows — M2. */
  def predict(fitted: Fitted, pairs: DataFrame): DataFrame =
    fitted.pipeline.transform(pairs)

  /** Coefficient table (idx, value) + intercept at idx -1, for inspection
    * and the rows-only query surface. */
  def coefficients(fitted: Fitted): Seq[(Int, Double)] =
    (-1, fitted.model.intercept) +:
      fitted.model.coefficients.toArray.toSeq.zipWithIndex.map(_.swap)
}
