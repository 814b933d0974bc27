package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics2

/** Semantic property tests for the r7c analytics batch — each query's
  * defining invariant replayed brute-force on collected sf0.001 data
  * (registry/oracle runs cover execution and cross-engine equality;
  * these pin the MEANING against an independent in-memory referee).
  */
class Analytics2Spec extends AnyFunSuite with SharedSpark {

  test("expectations report matches an in-memory constraint evaluation") {
    val o = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .collect()
    val custKeys = Tables.customer(spark, sfDir).select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    val n = o.length.toLong
    val dateNonnull = o.count(!_.isNullAt(4)).toLong
    val keyDistinct = o.map(_.getLong(0)).distinct.length.toLong
    val rangeViol = o.count(_.getDouble(3) <= 0).toLong
    val setViol = o.count(r => !Set("O", "F", "P")(r.getString(2))).toLong
    val riViol = o.count(r => !custKeys(r.getLong(1))).toLong
    val expected = Map(
      "completeness_o_orderdate" -> ((dateNonnull * 1000L) / n, dateNonnull == n),
      "unique_o_orderkey" -> ((keyDistinct * 1000L) / n, keyDistinct == n),
      "range_o_totalprice_gt0" -> ((rangeViol, rangeViol == 0L)),
      "accepted_o_orderstatus" -> ((setViol, setViol == 0L)),
      "ri_o_custkey_in_customer" -> ((riViol, riViol == 0L)))
    val got = Analytics2.qExpectations(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2) == "pass"))).toMap
    assert(got == expected)
    assert(got.values.forall(_._2), s"synthetic data should pass all checks: $got")
  }

  test("quantile normalization: within a percentile bucket, norm_chars is the pooled mean") {
    val docs = Tables.documents(spark, sfDir).select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPct = docs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.length.toLong
      sorted.zipWithIndex.map { case (r, i) => (i.toLong * 100L / n, r._3) }
    }
    val expectedRef = byPct.groupBy(_._1).map { case (pct, vs) =>
      pct -> vs.map(_._2).sum / vs.length }
    val got = Analytics2.qQuantileNormalize(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getLong(4) == expectedRef(r.getLong(1)),
        s"norm_chars mismatch at pct ${r.getLong(1)}")
    }
    // every (source, pct) bucket of the input is present exactly once
    val keys = got.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("Cohen's kappa matches the in-memory contingency formula") {
    val docs = Tables.documents(spark, sfDir).select("n_chars", "text").collect()
    val lab = docs.map(r =>
      (r.getLong(0) >= 400, r.getString(1).trim.split("\\s+").length >= 67))
    val n = lab.length.toDouble
    val n11 = lab.count(p => p._1 && p._2)
    val n10 = lab.count(p => p._1 && !p._2)
    val n01 = lab.count(p => !p._1 && p._2)
    val n00 = lab.count(p => !p._1 && !p._2)
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    val expected = BigDecimal((po - pe) / (1 - pe))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Analytics2.qCohenKappa(spark, sfDir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((n11.toLong, n10.toLong, n01.toLong, n00.toLong)))
    assert(math.abs(r.getDouble(5) - expected) < 2e-4, s"kappa ${r.getDouble(5)} vs $expected")
    assert(r.getDouble(5) > 0.5, "the two length labelers must agree beyond chance")
  }

  test("interval union coverage matches an in-memory sweep line") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")),
        expr("CAST(round(value * 100) AS BIGINT) * 10000L"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + r.getLong(2)))
    val expected = evs.groupBy(_._1).map { case (u, ivs) =>
      val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
      var islands = List.empty[(Long, Long)]
      sorted.foreach { case (s0, e0) =>
        islands match {
          case (s1, e1) :: rest if s0 <= e1 => islands = (s1, math.max(e0, e1)) :: rest
          case _ => islands = (s0, e0) :: islands
        }
      }
      u -> ((ivs.length.toLong, islands.length.toLong,
        islands.map(i => i._2 - i._1).sum))
    }
    val got = Analytics2.qIntervalUnion(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("Kaplan-Meier: survival is the product-limit over at-risk counts") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val lts = evs.groupBy(_._1).values.map { rows =>
      val f = rows.map(_._2).min
      val fp = rows.filter(_._3 == "purchase").map(_._2).minOption
      val hours = fp.map(p => Math.floorDiv(p - f, 3600000000L))
      val censored = hours.forall(_ >= 48L)
      (if (censored) 48L else hours.get, censored)
    }.toSeq
    assert(lts.exists(_._2) && lts.exists(!_._2),
      "fixture must exercise both conversion and censoring")
    val total = lts.length.toLong
    val perHour = lts.groupBy(_._1).toSeq.sortBy(_._1)
    var atRiskAbove = total // users with t >= current hour, updated as we walk
    var s = 1.0
    val expected = perHour.flatMap { case (t, rows) =>
      val d = rows.count(!_._2).toLong
      val c = rows.count(_._2).toLong
      val nRisk = atRiskAbove
      atRiskAbove -= (d + c)
      s *= 1.0 - d.toDouble / nRisk
      if (d > 0) Some((t, nRisk, d, c, s)) else None
    }
    val got = Analytics2.qSurvivalKm(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4) == ((e._1, e._2, e._3, e._4)), s"counts at day ${g._1}")
      assert(math.abs(g._5 - e._5) < 2e-4, s"s_hat at day ${g._1}: ${g._5} vs ${e._5}")
    }
    assert(got.last._5 <= got.head._5, "survival must be non-increasing")
  }

  test("bootstrap CI is deterministic, brackets the plain mean, and has positive width") {
    val r1 = Analytics2.qBootstrapCi(spark, sfDir).collect()
    val r2 = Analytics2.qBootstrapCi(spark, sfDir).collect()
    assert(r1.toSeq == r2.toSeq, "hash-seeded bootstrap must be bit-stable")
    val plain = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority").agg(avg("o_totalprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1.foreach { r =>
      val (p, lo, hi) = (r.getString(0), r.getDouble(3), r.getDouble(4))
      assert(hi > lo, s"degenerate CI for $p")
      assert(plain(p) > lo - 1 && plain(p) < hi + 1,
        s"plain mean ${plain(p)} outside bootstrap CI [$lo, $hi] for $p")
    }
  }
}
