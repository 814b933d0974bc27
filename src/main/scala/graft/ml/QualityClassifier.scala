package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, VectorAssembler}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.vector_to_array
import graft.text.TextFunctions._

/** FastText-style linear quality classifier — the MODEL-based stage of a
  * curation pipeline (the CCNet / WebText-filtering pattern): train a
  * logistic regression over feature-HASHED token counts against weak
  * labels, then score every document and gate on the probability.
  *
  * Why this shape at corpus scale:
  *  - feature hashing (HashingTF, 2¹² buckets) needs NO vocabulary
  *    pass, no token↔id join, no broadcast dictionary — tokenize and
  *    hash are per-row expressions, so featurization is a narrow map
  *    over the corpus however large it is;
  *  - the trained model is a single dense weight vector (2¹² doubles —
  *    driver-sized); SCORING is a per-row sparse dot product, again
  *    fully parallel with no shuffle;
  *  - only TRAINING aggregates (LBFGS gradient sums — tree-aggregated
  *    by spark.ml), and it runs on a bounded labeled sample, not the
  *    full corpus.
  *
  * Weak labels here are the Gopher rule gate (docs passing all four
  * rules = positive) — the standard bootstrap when no human labels
  * exist; the classifier generalizes the brittle rule boundary into a
  * smooth score. A raw linear halfspace cannot express the gate's
  * TWO-SIDED intervals (a box), so the stat features ride along with
  * their SQUARES: a concave parabola a·x − b·x² is high exactly on an
  * interval, making the in-range signal linearly accessible — train
  * accuracy goes from majority-class collapse (~0.77) to >0.95
  * (MlSpec pins it, plus the beats-majority margin). */
object QualityClassifier {

  val NumFeatures = 4096

  /** Gopher-gate weak label (1.0 = passes all four rules) plus the
    * feature vector: hashed token counts ++ the document-statistic
    * features a quality model actually needs (token count, mean word
    * length, stopword count, distinct ratio — fastText gets these
    * implicitly through n-grams; with feature hashing they must ride
    * along explicitly, and all of them stay per-row expressions). */
  def featurize(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    val nToks = size(toks).cast("long")
    val meanWordLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / nToks.cast("double")
    val nStop = size(filter(toks,
      t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    val distinctRatio =
      size(array_distinct(toks)).cast("double") / nToks.cast("double")
    val withToks = docs.withColumn("toks", tokens(col("text")))
      .withColumn("n_toks", nToks.cast("double"))
      .withColumn("n_toks_sq", (nToks * nToks).cast("double"))
      .withColumn("mean_word_len", meanWordLen)
      .withColumn("mean_word_len_sq", meanWordLen * meanWordLen)
      .withColumn("n_stop", nStop.cast("double"))
      .withColumn("distinct_ratio", distinctRatio)
      .withColumn("label",
        (nToks >= 30 && nToks <= 80 &&
          meanWordLen >= 3.9 && meanWordLen <= 5.1 &&
          nStop >= 2 && distinctRatio >= 0.5).cast("double"))
    val hashed = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(NumFeatures).transform(withToks)
    // squared stats let the linear model bend around TWO-SIDED rules: a
    // concave parabola a·x − b·x² is high exactly on an interval, so the
    // in-range/out-of-range signal of r1/r2 becomes linearly accessible
    new VectorAssembler()
      .setInputCols(Array("tf", "n_toks", "n_toks_sq",
        "mean_word_len", "mean_word_len_sq", "n_stop", "distinct_ratio"))
      .setOutputCol("features")
      .transform(hashed)
  }

  /** Fit the linear classifier on the weak labels. L2-regularized,
    * fixed iteration budget, standardized (hashed counts and document
    * stats live on different scales) — deterministic given the data
    * (LBFGS over tree-aggregated gradients, no RNG).
    *
    * The fitted model's `trainingSummary` is STRIPPED before returning:
    * the summary holds the live SparkSession, and `model.transform`'s
    * prediction UDF captures the whole model — whenever the planner
    * ships that UDF inside a task closure, serialization dies on
    * `ObservationManager` (observed intermittently, plan-shape
    * dependent). Prediction needs only coefficients; the summary is
    * training-time metadata. */
  def fit(featurized: DataFrame): LogisticRegressionModel = {
    val model = new LogisticRegression()
      .setMaxIter(100).setRegParam(1e-4).setStandardization(true)
      .fit(featurized)
    stripSummary(model)
  }

  /** Null the (non-transient) trainingSummary var via reflection — the
    * only way in: the field is private to Spark ML and `copy()`
    * re-attaches it. Scans the class hierarchy so a field rename fails
    * loudly here rather than resurfacing as a task-serialization
    * heisenbug. */
  private def stripSummary(model: LogisticRegressionModel): LogisticRegressionModel = {
    val field = Iterator.iterate[Class[_]](model.getClass)(_.getSuperclass)
      .takeWhile(_ != null)
      .flatMap(_.getDeclaredFields)
      .find(_.getName.contains("trainingSummary"))
      .getOrElse(throw new IllegalStateException(
        "LogisticRegressionModel no longer has a trainingSummary field - " +
          "re-check the serialization hazard this strip exists for"))
    field.setAccessible(true)
    field.set(model, None)
    model
  }

  /** Per-document quality score in [0,1] — P(passes the gate). */
  def score(model: LogisticRegressionModel, featurized: DataFrame): DataFrame =
    model.transform(featurized)
      .withColumn("quality_score",
        element_at(vector_to_array(col("probability")), 2))
      .select(col("doc_id"), col("label"), col("quality_score"))
}
