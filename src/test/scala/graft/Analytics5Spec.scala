package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics5

/** Semantic property tests for the r7f batch — in-memory referees for
  * the KS statistic, degree assortativity, and the AUC/calibration
  * algebra of the classifier evaluation.
  */
class Analytics5Spec extends AnyFunSuite with SharedSpark {

  test("KS: D equals the exact max CDF gap over the merged support") {
    val docs = Tables.documents(spark, sfDir).select("source", "n_chars")
      .collect().map(r => (r.getString(0).length == 4, r.getLong(1)))
    val a = docs.filter(_._1).map(_._2); val b = docs.filterNot(_._1).map(_._2)
    val support = (a ++ b).distinct.sorted
    val dScaled = support.map(v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)).max
    val r = Analytics5.qKsTest(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((a.length.toLong, b.length.toLong, dScaled)))
    assert(r.getLong(3) == dScaled * 1000L / (a.length.toLong * b.length))
    val crit = 1.358 * math.sqrt((a.length + b.length).toDouble / (a.length.toLong * b.length))
    assert((r.getLong(5) == 1L) ==
      (dScaled.toDouble / (a.length.toLong * b.length) > crit))
  }

  test("assortativity equals the in-memory Pearson over edge endpoint degrees") {
    val edges = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val degO = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val degP = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = edges.map(e => (degO(e._1), degP(e._2)))
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val expected = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    val r = Analytics5.qAssortativity(spark, sfDir).collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(3) - expected) < 2e-6,
      s"assortativity ${r.getDouble(3)} vs $expected")
  }

  test("classifier eval: reported AUC and calibration match the scored frame") {
    import graft.ml.QualityClassifier
    val feat = QualityClassifier.featurize(Tables.documents(spark, sfDir))
    val scored = QualityClassifier.score(QualityClassifier.fit(feat), feat)
      .select(col("quality_score"), col("label")).collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, r.getDouble(0), r.getDouble(1) > 0.5))
    // tie-corrected MW AUC on the quantized scores
    val sorted = scored.sortBy(_._1)
    val rankOf = scala.collection.mutable.Map.empty[Double, Double]
    var idx = 0
    sorted.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (pq, rows) =>
      rankOf(pq) = idx + (rows.length + 1) / 2.0
      idx += rows.length
    }
    val nPos = scored.count(_._3).toLong
    val nNeg = scored.length - nPos
    val rankSum = scored.filter(_._3).map(r => rankOf(r._1)).sum
    val expectedAuc = (rankSum - nPos * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
    val rows = Analytics5.qClassifierEval(spark, sfDir).collect()
    val gotAuc = rows.head.getDouble(6) // (bucket, n, mean_pred, label_rate, n_pos, n_neg, auc)
    assert(math.abs(gotAuc - expectedAuc) < 2e-4, s"auc $gotAuc vs $expectedAuc")
    assert(gotAuc > 0.8, "the learned gate must separate its own training labels well")
    // calibration buckets: counts and label rates
    val byBucket = scored.groupBy(r => math.min(9L, math.floor(r._2 * 10).toLong))
    rows.foreach { r =>
      val b = byBucket(r.getLong(0))
      assert(r.getLong(1) == b.length.toLong, s"bucket ${r.getLong(0)} count")
      assert(r.getLong(3) == b.count(_._3).toLong * 1000L / b.length,
        s"bucket ${r.getLong(0)} label rate")
    }
    assert(rows.map(_.getLong(1)).sum == scored.length.toLong)
  }
}
