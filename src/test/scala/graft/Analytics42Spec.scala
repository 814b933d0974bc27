package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics42

/** Independent in-memory referees for the r9 batch-24 queries. */
class Analytics42Spec extends AnyFunSuite with SharedSpark {

  test("mrr: first-relevant rank replay per segment") {
    val cnts = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = cust.groupBy(_._1).map { case (seg, g) =>
      val ordered = g.sortBy(t => (-t._3, t._2))
      val fr = ordered.indexWhere(t => cnts.getOrElse(t._2, 0L) >= 8) + 1
      seg -> ((fr.toLong, 1000000L / fr))
    }
    val mrr = expected.values.map(_._2).sum / expected.size
    val got = Analytics42.qMrr(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (seg, (fr, rr, m)) =>
      assert((fr, rr) == expected(seg)); assert(m == mrr)
    }
  }

  test("drawdown episodes: sequential segmentation replay") {
    val ys = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .orderBy("day").collect().map(_.getLong(1)).toIndexedSeq
    var runmax = Long.MinValue; var epi = 0L
    val agg = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    ys.foreach { x =>
      if (x >= runmax) { runmax = x; epi += 1 }
      else {
        val (du, pk, dp) = agg.getOrElse(epi, (0L, 0L, 0L))
        agg(epi) = (du + 1, math.max(pk, runmax), math.max(dp, runmax - x))
      }
    }
    val expected = agg.toSeq.map { case (e, (du, pk, dp)) => (e, du, pk, dp) }
      .sortBy(t => (-t._4, t._1)).take(5)
    val got = Analytics42.qDrawdownEpisodes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // depth never exceeds its peak
    got.foreach(t => assert(t._4 <= t._3))
  }

  test("repurchase interval: gap census replay") {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps: Seq[Long] = p.groupBy(_._1).values.flatMap { g =>
      val ordered = g.sortBy(t => (t._2, t._3))
      ordered.indices.drop(1).map(i => (ordered(i)._2 - ordered(i - 1)._2) / 60000000L)
    }.toSeq.sorted
    val n = gaps.length
    val median = gaps((n + 1) / 2 - 1)
    val p90 = gaps((n * 9 + 9) / 10 - 1)
    val row = Analytics42.qRepurchaseInterval(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == median)
    // rank-selection convention: smallest value with upto*10 >= n*9
    val p90q = gaps.distinct.find(g => gaps.count(_ <= g) * 10 >= n * 9).get
    assert(row.getLong(2) == p90q)
    assert(row.getLong(3) == gaps.sum / n)
    val _ = p90
  }

  test("price endings: census replay; chi2 scaled stat") {
    val cents = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT) % 100"))
      .collect().map(_.getLong(0))
    val census = cents.groupBy(identity).map { case (e, g) => (e, g.length.toLong) }
    val n = cents.length.toLong
    val so2 = census.values.map(c => BigInt(c) * c).sum
    val chi2 = ((BigInt(100) * so2 - BigInt(n) * n) * 1000000 / (BigInt(n) * n)).toLong
    val expected = census.toSeq.sortBy(t => (-t._2, t._1)).take(10)
      .map(t => (t._1, t._2, t._2 * 1000000L / n, chi2))
    val got = Analytics42.qPriceEndings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }
}
