package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{PoissonModel, Simulate}

import scala.util.Random

class MlSpec extends AnyFunSuite with SharedSpark {

  test("poisson pmf: sums to ~1, mode at floor(lambda)") {
    val total = (0 to 40).map(Simulate.poissonPmf(_, 2.3)).sum
    assert(math.abs(total - 1.0) < 1e-6)
    assert((0 to 10).maxBy(Simulate.poissonPmf(_, 2.3)) == 2)
  }

  test("outcome probabilities sum to 1 and favor the stronger team") {
    val (w, d, l) = Simulate.outcomeProbs(2.0, 0.8)
    // score matrix truncated at maxGoals → ~1e-6 tail mass missing
    assert(math.abs(w + d + l - 1.0) < 1e-4)
    assert(w > l)
  }

  test("simulation is deterministic under a fixed seed") {
    val teams = Seq("A", "B", "C", "D", "E", "F", "G", "H")
    val strength = teams.zipWithIndex.map { case (t, i) => t -> (0.8 + i * 0.2) }.toMap
    val r1 = Simulate.tournament(7L, teams.grouped(4).toSeq, strength)
    val r2 = Simulate.tournament(7L, teams.grouped(4).toSeq, strength)
    assert(r1 == r2)
  }

  test("elimination matches never end in a draw") {
    val rng = new Random(1L)
    (1 to 50).foreach { _ =>
      val r = Simulate.simulateMatch(rng, 1.4, 1.4, elimination = true)
      assert(r.winner != 0)
    }
  }

  test("GLM fit on sufficient statistics equals fit on raw rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val raw = Tables.lineitem(spark, sfDir).select(
      col("l_quantity").cast("int").as("goals"),
      col("l_returnflag").as("team"),
      col("l_linestatus").as("opponent"),
      (lit(1.0) + col("l_discount")).as("weight"))
    val collapsed = raw.groupBy("goals", "team", "opponent")
      .agg(sum("weight").as("weight"))
    // compare predictions, not coefficients: RFormula's StringIndexer
    // orders categories by frequency, which collapsing changes, so the
    // one-hot baseline shifts while the fitted rate surface λ(team,
    // opponent) stays the same (same likelihood optimum)
    val pairs = raw.select("team", "opponent").distinct()
    def preds(fit: PoissonModel.Fitted) =
      PoissonModel.predict(fit, pairs.withColumn("goals", lit(0)))
        .select("team", "opponent", "prediction").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val pRaw = preds(PoissonModel.fit(raw))
    val pCol = preds(PoissonModel.fit(collapsed))
    assert(pRaw.keySet == pCol.keySet)
    pRaw.foreach { case (k, v) =>
      assert(math.abs(v - pCol(k)) < 1e-4 * math.max(1.0, v), s"pred $k: $v vs ${pCol(k)}")
    }
  }

  test("GLM parity fixture: reference-model λ predictions match pinned values") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    assume(new java.io.File(graft.queries.Ml.footballCsv).exists())
    // SURVEY §5.4: closeness against fixed values — λ for a fixed set of
    // (team, opponent) pairs from the full reference model (all matches,
    // F9 recency weights), pinned from a converged fit (maxIter 10, tol
    // 1e-8; the fit is deterministic to the last bit across reruns, the
    // tolerance only absorbs float-summation order across thread counts)
    val pinned = Map(
      ("Brazil", "Argentina") -> 1.7784934031436155,
      ("Argentina", "Brazil") -> 0.8931195404644837,
      ("England", "Scotland") -> 1.5780114599627224,
      ("Germany", "Netherlands") -> 1.5774832666046001,
      ("France", "Italy") -> 1.11450628539187,
      ("Spain", "Portugal") -> 1.4641680020196777)
    val pinnedDeviance = 4339.611739587535
    val data = graft.etl.FootballEtl.modelData(spark, graft.queries.Ml.footballCsv)
      .filter(col("goals").isNotNull && col("weight") > 0 &&
        col("weight") =!= lit(Double.PositiveInfinity))
    val collapsed = data.groupBy("goals", "team", "opponent")
      .agg(sum("weight").as("weight")).cache()
    val fitted =
      try PoissonModel.fit(collapsed)
      finally collapsed.unpersist()
    val preds = PoissonModel.predict(fitted,
        pinned.keys.toSeq.toDF("team", "opponent").withColumn("goals", lit(0)))
      .select("team", "opponent", "prediction").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pinned.foreach { case (k, want) =>
      assert(math.abs(preds(k) - want) < 1e-3 * want, s"λ$k: ${preds(k)} vs $want")
    }
    assert(math.abs(fitted.model.summary.deviance - pinnedDeviance) < 1e-3 * pinnedDeviance)
  }

  test("GLM poisson recovers a known rate structure") {
    import spark.implicits._
    // two-level factor with true rates 1.0 and e^1 ≈ 2.718: the fitted
    // log-link coefficients should recover log-rate ratios within noise
    val rng = new Random(11L)
    def pois(lambda: Double): Int = {
      var k = 0; var p = math.exp(-lambda); var u = rng.nextDouble(); var c = p
      while (u > c && k < 50) { k += 1; p = p * lambda / k; c += p }
      k
    }
    val rows = (1 to 4000).map { i =>
      val team = if (i % 2 == 0) "hi" else "lo"
      val lambda = if (team == "hi") math.exp(1.0) else 1.0
      (pois(lambda), team, "x", 1.0)
    }
    val df = rows.toDF("goals", "team", "opponent", "weight")
    val fitted = PoissonModel.fit(df, "goals ~ team")
    val preds = PoissonModel.predict(fitted,
      Seq(("hi", "x"), ("lo", "x")).toDF("team", "opponent"))
      .select("team", "prediction").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(preds("hi") - math.exp(1.0)) < 0.15, s"hi pred ${preds("hi")}")
    assert(math.abs(preds("lo") - 1.0) < 0.1, s"lo pred ${preds("lo")}")
  }

  test("quality classifier learns the weak rule gate and is deterministic") {
    import graft.ml.QualityClassifier
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val feat = QualityClassifier.featurize(docs).cache()
    try {
      val both = feat.groupBy("label").count().collect()
      assert(both.length == 2, "fixture must contain passes AND fails")
      val model = QualityClassifier.fit(feat)
      val scored = QualityClassifier.score(model, feat).cache()
      try {
        // scores are probabilities
        assert(scored.filter(col("quality_score") < 0.0 ||
          col("quality_score") > 1.0).count() == 0L)
        // the squared-stat features make the two-sided rules linearly
        // accessible — demand near-complete rule recovery AND a real
        // margin over the majority-class baseline (a collapsed model
        // scores exactly the majority fraction)
        val n = scored.count().toDouble
        val correct = scored.filter(
          (col("quality_score") > 0.5) === (col("label") === 1.0)).count()
        val acc = correct / n
        val majority = math.max(
          scored.filter(col("label") === 1.0).count() / n,
          scored.filter(col("label") === 0.0).count() / n)
        assert(acc >= 0.9 && acc >= majority + 0.05,
          s"train accuracy $acc vs majority baseline $majority")
        // determinism: same data, second fit => identical scores
        val model2 = QualityClassifier.fit(feat)
        val s1 = scored.orderBy("doc_id")
          .collect().map(_.getDouble(2))
        val s2 = QualityClassifier.score(model2, feat).orderBy("doc_id")
          .collect().map(_.getDouble(2))
        s1.zip(s2).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"non-deterministic fit: $a vs $b")
        }
      } finally scored.unpersist()
    } finally feat.unpersist()
  }
}
