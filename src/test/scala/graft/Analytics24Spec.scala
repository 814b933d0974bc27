package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics24

/** In-memory referees for the r9 batch-6 operators. */
class Analytics24Spec extends AnyFunSuite with SharedSpark {

  test("DiD: four cell means and the estimate replay") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val minTs = evs.map(_._2).min
    val splitUs = {
      val d0 = java.time.Instant.ofEpochSecond(0, minTs * 1000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.plusDays(4)
      d0.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    }
    def mean(t: Long, pre: Boolean): Double = {
      val g = evs.filter(e => e._1 % 2 == t && (e._2 < splitUs) == pre)
      g.map(_._3).sum.toDouble / g.length
    }
    val did = (mean(1, false) - mean(1, true)) -
      (mean(0, false) - mean(0, true))
    val r = Analytics24.qDiffInDiff(spark, sfDir).collect().head
    assert(r.getLong(0) == evs.length.toLong)
    assert(math.abs(r.getDouble(5) - did / 100.0) < 1e-6,
      s"did ${r.getDouble(5)} vs ${did / 100.0}")
  }

  test("chi2 GOF: exact integer identity against the naive statistic") {
    val counts = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(_.getLong(1))
    val k = counts.length.toLong
    val n = counts.sum
    val chi2Milli = (k * counts.map(c => c * c).sum - n * n) * 1000 / n
    val r = Analytics24.qChiSquare(spark, sfDir).collect().head
    assert(r.getLong(0) == k && r.getLong(1) == n)
    assert(r.getLong(2) == chi2Milli)
    // identity check vs the textbook sum form
    val e = n.toDouble / k
    val textbook = counts.map(o => (o - e) * (o - e) / e).sum
    assert(math.abs(r.getLong(2) / 1000.0 - textbook) < 0.002)
  }

  test("KWIC: window bounds and containment") {
    val rows = Analytics24.qKwic(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ctx = r.getString(2).split(" ")
      assert(ctx.contains("data"), s"doc ${r.getLong(0)}: 'data' not in window")
      assert(ctx.length <= 5)
      assert(r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(3))
    }
    // every doc whose tokens contain "data" is present
    val expected = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().filter(_.getString(1).trim.split("\\s+").contains("data"))
      .map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == expected)
  }

  test("reconcile: buckets partition orders, totals match the naive scan") {
    val lineTotals = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(o => lineTotals.contains(o._1))
    val diffs = orders.map { case (k, h) =>
      val a = math.abs(lineTotals(k) - h)
      val ppm = a * 1000000 / h
      val b = if (ppm == 0) "exact" else if (ppm <= 10000) "within_1pct"
        else if (ppm <= 100000) "within_10pct" else "divergent"
      (b, a)
    }
    val expected = diffs.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).max, g.map(_._2).sum)).toMap
    val got = Analytics24.qReconcile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == orders.length.toLong)
  }
}
