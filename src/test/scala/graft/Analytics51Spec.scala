package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics51

/** Independent in-memory referees for the r9 batch-33 queries. */
class Analytics51Spec extends AnyFunSuite with SharedSpark {

  test("ewma chart: recursion replay with time-varying limits") {
    val ys = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .orderBy("day").collect().map(_.getLong(1)).toIndexedSeq
    val n = ys.length
    val xbar = ys.sum / n
    val mrbar = ys.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (n - 1)
    val sigma = mrbar.toDouble * 1000 / 1128
    var z = xbar.toDouble; var f = 1.0; var viol = 0L
    ys.foreach { y =>
      val z2 = 0.2 * y + 0.8 * z
      val f2 = f * 0.64
      if (math.abs(z2 - xbar) > 3.0 * sigma * math.sqrt(0.2 / 1.8 * (1.0 - f2)))
        viol += 1
      z = z2; f = f2
    }
    val row = Analytics51.qEwmaChart(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - z) < 1e-4)
    assert(row.getLong(2) == viol)
    assert(math.abs(row.getDouble(3) - 3.0 * sigma * math.sqrt(0.2 / 1.8)) < 1e-3)
    // EWMA flags at least as often as the asymptotic-limit-only count
    assert(row.getLong(2) >= 0 && row.getLong(2) <= n)
  }

  test("stream dedup: doubled stream collapses to batch truth") {
    val got = Analytics51.qStreamDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("v"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
  }
}
