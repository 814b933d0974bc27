package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics8

/** Semantic referees for the r7o batch — in-memory recomputation of the
  * Mann–Whitney doubled-U algebra, the BH step-up cutoff, the span-mask
  * gaps-and-islands accounting, t-closeness EMD, the Theil–Sen median
  * slope, and neighborhood Jaccard.
  */
class Analytics8Spec extends AnyFunSuite with SharedSpark {

  test("Mann-Whitney: doubled U and z match the in-memory tie-corrected referee") {
    val docs = Tables.documents(spark, sfDir).select("lang", "n_chars")
      .collect().map(r => (r.getString(0) == "en", r.getLong(1)))
    val all = docs.map(_._2).sorted
    val nA = docs.count(_._1).toLong
    val n = docs.length.toLong
    // doubled mid-rank per value
    val rank2 = all.distinct.map { v =>
      val below = all.count(_ < v).toLong
      val at = all.count(_ == v).toLong
      v -> (2 * below + at + 1)
    }.toMap
    val r2a = docs.filter(_._1).map(d => rank2(d._2)).sum
    val u2a = r2a - nA * (nA + 1)
    val tie3 = all.groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * t * t - t).sum
    val nB = n - nA
    val z = ((r2a - nA * (nA + 1) - nA * nB).toDouble / 2.0) /
      math.sqrt(nA * nB / 12.0 * ((n + 1).toDouble - tie3.toDouble / (n * (n - 1))))
    val row = Analytics8.qMannWhitney(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((nA, nB, u2a, tie3)))
    assert(math.abs(row.getDouble(4) - z) < 1e-3, s"z ${row.getDouble(4)} vs $z")
  }

  test("BH: discoveries are exactly the step-up prefix of the p-ordered tests") {
    val rows = Analytics8.qBhFdr(spark, sfDir)
      .selectExpr("CAST(p_rank AS BIGINT)", "p_value", "CAST(discovery AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val m = rows.length
    // referee: k* = max{k : p_(k) <= k * 0.05 / m}; discoveries = ranks <= k*
    val kStar = rows.filter { case (k, p, _) => p <= k * 0.05 / m }
      .map(_._1).maxOption.getOrElse(0L)
    rows.foreach { case (k, _, disc) =>
      assert(disc == (if (k <= kStar) 1L else 0L), s"rank $k flag $disc k*=$kStar")
    }
    // p-values must be sorted by rank
    assert(rows.map(_._2).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)))
  }

  test("span mask: per-doc counts replay the deterministic rule with span merging") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = Analytics8.qSpanMask(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docs.take(50).foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val mask = toks.indices.map(i => ((id % 97) * 131 + i) % 10 == 0)
      val spans = mask.indices.count(i => mask(i) && (i == 0 || !mask(i - 1)))
      assert(got(id) == ((toks.length.toLong, mask.count(identity).toLong, spans.toLong)),
        s"doc $id")
    }
  }

  test("t-closeness: EMD numerator matches the in-memory cumulative-gap sum") {
    val custDf = Tables.customer(spark, sfDir)
    val natDf = Tables.nation(spark, sfDir)
    val cust = custDf
      .join(natDf, custDf("c_nationkey") === natDf("n_nationkey"))
      .select("n_name", "c_acctbal").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100) / 200000L))
    val bands = cust.map(_._2).distinct.sorted
    val total = cust.length.toLong
    val rows = Analytics8.qTCloseness(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    cust.groupBy(_._1).foreach { case (nation, members) =>
      val nG = members.length.toLong
      val gap = bands.map { b =>
        val cumG = members.count(_._2 <= b).toLong
        val cumAll = cust.count(_._2 <= b).toLong
        math.abs(cumG * total - cumAll * nG)
      }.sum
      val (gotNg, gotGap, gotViol) = rows(nation)
      assert((gotNg, gotGap) == ((nG, gap)), s"nation $nation")
      assert(gotViol == (if (gap * 5 > bands.length * nG * total) 1L else 0L))
    }
  }

  test("Theil-Sen: sen slope is the interpolated median of all pair slopes") {
    val ordersDf = Tables.orders(spark, sfDir)
    val custDf = Tables.customer(spark, sfDir)
    val natDf = Tables.nation(spark, sfDir)
    val monthly = ordersDf
      .join(custDf, ordersDf("o_custkey") === custDf("c_custkey"))
      .join(natDf, custDf("c_nationkey") === natDf("n_nationkey"))
      .selectExpr("n_name",
        "year(o_orderdate) * 12 + month(o_orderdate) AS m",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = Analytics8.qTheilSen(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    monthly.groupBy(_._1).foreach { case (nation, rows) =>
      val byMonth = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val slopes = (for {
        (m1, r1) <- byMonth; (m2, r2) <- byMonth if m1 < m2
      } yield (r2 - r1).toDouble / (m2 - m1)).sorted
      val n = slopes.length
      val median =
        if (n % 2 == 1) slopes(n / 2)
        else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
      val (gotPairs, gotSlope) = got(nation)
      assert(gotPairs == n.toLong, s"$nation pair count")
      assert(math.abs(gotSlope - median) < 1e-3, s"$nation slope $gotSlope vs $median")
    }
  }

  test("link predict: every reported pair's jaccard matches its degrees") {
    val rows = Analytics8.qLinkPredict(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (common, d1, d2, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(common >= 3 && common <= math.min(d1, d2))
      val expect = BigDecimal(common.toDouble / (d1 + d2 - common))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - expect) < 1e-9)
    }
    // descending primary order
    val commons = rows.map(_.getLong(2))
    assert(commons.sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
  }
}
