package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics46

/** Independent in-memory referees for the r9 batch-28 queries. */
class Analytics46Spec extends AnyFunSuite with SharedSpark {

  test("nelson-aalen: sequential at-risk replay; hazard sums monotone") {
    val pu = Tables.events(spark, sfDir).groupBy("user_id").agg(
      min(unix_micros(col("ts"))).as("f"),
      min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("fp"))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val lts = pu.map { case (f, fp) =>
      fp.map(p => (p - f) / 3600000000L).filter(_ < 48) match {
        case Some(t) => (t, false)
        case None => (48L, true)
      }
    }
    val byHour = lts.groupBy(_._1).map { case (t, g) =>
      (t, g.count(!_._2).toLong, g.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = lts.length.toLong
    var hCum = 0L
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    byHour.foreach { case (t, d, c) =>
      val inc = d * 1000000L / atRisk
      hCum += inc
      if (d > 0) expected += ((t, atRisk, d, inc, hCum))
      atRisk -= (d + c)
    }
    val got = Analytics46.qNelsonAalen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected.toSeq)
    got.map(_._5).sliding(2).foreach { case Array(a, b) => assert(a <= b) }
  }

  test("ece: weighted gap replay; mce bounds ece") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_orderstatus") === "F").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val train = o.filter(_._2 % 2 == 0).groupBy(_._1)
      .map { case (b, g) => b -> g.map(_._3).sum * 1000000L / g.length }
    val test = o.filter(_._2 % 2 == 1).groupBy(_._1)
      .map { case (b, g) => b -> ((g.length.toLong, g.map(_._3).sum * 1000000L / g.length)) }
    val gaps = test.keys.filter(train.contains)
      .map(b => (test(b)._1, math.abs(train(b) - test(b)._2))).toSeq
    val n = gaps.map(_._1).sum
    val row = Analytics46.qEce(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == gaps.map(t => t._1 * t._2).sum / n)
    assert(row.getLong(2) == gaps.map(_._2).max)
    assert(row.getLong(1) <= row.getLong(2))
  }

  test("chow test: half-fit OLS replay") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .select(expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT)"), col("y"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val is = daily.map(_._1)
    val mid = is.min + ((is.max - is.min) / 2).floor
    def ssr(g: Array[(Double, Double)]): Double = {
      val n = g.length
      val mx = g.map(_._1).sum / n; val my = g.map(_._2).sum / n
      val sxy = g.map(t => (t._1 - mx) * (t._2 - my)).sum
      val sxx = g.map(t => (t._1 - mx) * (t._1 - mx)).sum
      val syy = g.map(t => (t._2 - my) * (t._2 - my)).sum
      syy - sxy * sxy / sxx
    }
    val g1 = daily.filter(_._1 <= mid); val g2 = daily.filter(_._1 > mid)
    val f = ((ssr(daily) - ssr(g1) - ssr(g2)) / 2) /
      ((ssr(g1) + ssr(g2)) / (daily.length - 4))
    val row = Analytics46.qChowTest(spark, sfDir).collect().head
    assert(row.getLong(0) == daily.length.toLong)
    assert(math.abs(row.getDouble(1) - f) < math.abs(f) * 1e-4 + 1e-3)
    assert(row.getDouble(1) >= 0)
  }

  test("ljung-box: portmanteau replay from scratch lag correlations") {
    val ys = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .orderBy("day").collect().map(_.getLong(1).toDouble).toIndexedSeq
    val n = ys.length
    def rLag(k: Int): Double = {
      val a = ys.dropRight(k); val b = ys.drop(k)
      val m = a.length
      val ma = a.sum / m; val mb = b.sum / m
      a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum /
        math.sqrt(a.map(x => (x - ma) * (x - ma)).sum * b.map(x => (x - mb) * (x - mb)).sum)
    }
    val q = n.toDouble * (n + 2) * (1 to 5).map(k => math.pow(rLag(k), 2) / (n - k)).sum
    val row = Analytics46.qLjungBox(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - q) < math.abs(q) * 1e-5 + 1e-3)
    assert(row.getDouble(1) >= 0)
  }
}
