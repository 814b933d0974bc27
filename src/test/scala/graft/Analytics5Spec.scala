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

  test("classifier eval: in-memory replay of the closed-form fit, AUC, calibration") {
    // independent referee: refit the binned class-rate-difference model
    // from raw text in plain Scala collections and replay AUC + buckets
    val docs = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0))
    case class D(nt: Long, charsum: Long, ns: Long, ndist: Long) {
      val label: Long = if (nt >= 30 && nt <= 80 && charsum * 10 >= nt * 39 &&
        charsum * 10 <= nt * 51 && ns >= 2 && ndist * 2 >= nt) 1L else 0L
      val b1: Long = math.min(nt / 10, 12)
      val b2: Long = math.min((charsum * 2) / nt, 12)
      val b3: Long = math.min(ns, 10)
      val b4: Long = math.min((ndist * 10) / nt, 10)
    }
    val stop = Set("the", "a", "data", "row", "value")
    val ds = docs.map { t =>
      val tk = t.trim.split("\\s+")
      D(tk.length.toLong, tk.map(_.length.toLong).sum,
        tk.count(stop).toLong, tk.distinct.length.toLong)
    }
    val n1 = ds.map(_.label).sum
    val n0 = ds.length - n1
    def weights(bin: D => Long, bk: Long): Map[Long, Long] =
      ds.groupBy(bin).map { case (v, grp) =>
        val c1 = grp.map(_.label).sum; val c0 = grp.length - c1
        v -> (((c1 + 1) * 1000000L) / (n1 + bk) - ((c0 + 1) * 1000000L) / (n0 + bk))
      }
    val (w1, w2, w3, w4) = (weights(_.b1, 13), weights(_.b2, 13),
      weights(_.b3, 11), weights(_.b4, 11))
    val p0 = (n1 * 1000000L) / (n1 + n0) - (n0 * 1000000L) / (n1 + n0)
    val scored = ds.map(x =>
      (p0 + w1(x.b1) + w2(x.b2) + w3(x.b3) + w4(x.b4), x.label == 1L))
    // tie-corrected MW AUC over the integer scores
    val rankOf = scala.collection.mutable.Map.empty[Long, Double]
    var idx = 0
    scored.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (sc, rows) =>
      rankOf(sc) = idx + (rows.length + 1) / 2.0
      idx += rows.length
    }
    val rankSum = scored.filter(_._2).map(r => rankOf(r._1)).sum
    val expectedAuc = (rankSum - n1 * (n1 + 1) / 2.0) / (n1.toDouble * n0)
    val rows = Analytics5.qClassifierEval(spark, sfDir).collect()
    val gotAuc = rows.head.getLong(6) / 1e6 // (bucket, n, mean, rate, n_pos, n_neg, auc_ppm)
    assert(math.abs(gotAuc - expectedAuc) < 2e-6, s"auc $gotAuc vs $expectedAuc")
    assert(gotAuc > 0.9, "the closed-form model must separate its own labels")
    assert(rows.head.getLong(4) == n1 && rows.head.getLong(5) == n0)
    // calibration buckets: replay the cumulative-count decile assignment
    val ntot = ds.length.toLong
    val belowOf = scala.collection.mutable.Map.empty[Long, Long]
    var cum = 0L
    scored.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (sc, grp) =>
      belowOf(sc) = cum; cum += grp.length
    }
    val byBucket = scored.groupBy(r => math.min(9L, (10 * belowOf(r._1)) / ntot))
    rows.foreach { r =>
      val b = byBucket(r.getLong(0))
      assert(r.getLong(1) == b.length.toLong, s"bucket ${r.getLong(0)} count")
      assert(r.getLong(3) == b.count(_._2).toLong * 1000L / b.length,
        s"bucket ${r.getLong(0)} label rate")
      val meanShift = (b.map(_._1 + 5000000L).sum * 1000L) / b.length - 5000000000L
      assert(r.getLong(2) == meanShift, s"bucket ${r.getLong(0)} mean score")
    }
    assert(rows.map(_.getLong(1)).sum == ds.length.toLong)
  }
}
