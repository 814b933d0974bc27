package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics52

/** Independent in-memory referees for the r9 batch-34 queries. */
class Analytics52Spec extends AnyFunSuite with SharedSpark {

  private def daily(): IndexedSeq[Long] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .orderBy("day").collect().map(_.getLong(1)).toIndexedSeq

  test("record highs: running-max census + harmonic expectation") {
    val ys = daily()
    var mx = Long.MinValue; var rec = 0L
    ys.foreach { x => if (x >= mx) { mx = x; rec += 1 } }
    val harm = (1 to ys.length).map(k => 1000000L / k).sum
    val row = Analytics52.qRecordHighs(spark, sfDir).collect().head
    assert(row.getLong(0) == ys.length.toLong)
    assert(row.getLong(1) == rec)
    assert(row.getLong(2) == harm)
    assert(row.getLong(3) == rec * 1000000L - harm)
    // at least the first day is a record; no more than n records
    assert(rec >= 1 && rec <= ys.length)
  }

  test("mean excess: threshold replay; exceedance counts shrink with pct") {
    val xs = daily().sorted
    val n = xs.length
    def thr(inv: Int) = xs.distinct.find(u => xs.count(_ <= u) * inv >= n * (inv - 1)).get
    val expected = Seq((90L, 10), (95L, 20), (99L, 100)).map { case (pct, inv) =>
      val u = thr(inv)
      val ex = xs.filter(_ > u)
      (pct, u, ex.length.toLong, ex.map(x => x - u).sum / ex.length)
    }
    val got = Analytics52.qMeanExcess(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got(0)._3 >= got(1)._3 && got(1)._3 >= got(2)._3)
  }
}
