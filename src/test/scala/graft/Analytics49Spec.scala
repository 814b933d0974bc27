package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics49

/** Independent in-memory referees for the r9 batch-31 queries. */
class Analytics49Spec extends AnyFunSuite with SharedSpark {

  private def daily(): IndexedSeq[Long] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .orderBy("day").collect().map(_.getLong(1)).toIndexedSeq

  test("lloyd 1d: exact-rational iteration replay; centers ordered") {
    val xs = daily()
    val sorted = xs.sorted
    val n = sorted.length
    def sel(q: Int) = sorted(((n * q + 3) / 4 - 1) max 0)
    // seeds per the census rule: min x with upto*4 >= q*n
    val distinct = sorted.distinct
    def seed(mult: Int) =
      distinct.find(v => sorted.count(_ <= v) * 4 >= mult * n).get
    var (s1, n1) = (BigInt(seed(1)), BigInt(1))
    var (s2, n2) = (BigInt(seed(3)), BigInt(1))
    (1 to 3).foreach { _ =>
      val to1 = xs.map(x => BigInt(2) * x * n1 * n2 <= s1 * n2 + s2 * n1)
      val g1 = xs.zip(to1).filter(_._2).map(_._1)
      val g2 = xs.zip(to1).filterNot(_._2).map(_._1)
      s1 = g1.map(BigInt(_)).sum; n1 = BigInt(g1.length)
      s2 = g2.map(BigInt(_)).sum; n2 = BigInt(g2.length)
    }
    val row = Analytics49.qLloyd1d(spark, sfDir).collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(row.getLong(2) == (s1 / n1).toLong)
    assert(row.getLong(3) == (s2 / n2).toLong)
    assert(row.getLong(2) < row.getLong(3))
    assert(row.getLong(0) + row.getLong(1) == n.toLong)
    val _ = sel(1)
  }

  test("shorth: brute-force shortest half interval replay") {
    val xs = daily().sorted
    val n = xs.length
    val h = n / 2 + 1
    var best = (Long.MaxValue, -1)
    (0 to n - h).foreach { i =>
      val w = xs(i + h - 1) - xs(i)
      if (w < best._1) best = (w, i)
    }
    val i = best._2
    val mean = xs.slice(i, i + h).map(BigInt(_)).sum / h
    val row = Analytics49.qShorth(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == h.toLong)
    assert(row.getLong(2) == xs(i) && row.getLong(3) == xs(i + h - 1))
    assert(row.getLong(4) == best._1)
    assert(row.getLong(5) == mean.toLong)
    // the shorth mean lies inside its interval
    assert(row.getLong(5) >= row.getLong(2) && row.getLong(5) <= row.getLong(3))
  }
}
