package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics47

/** Independent in-memory referees for the r9 batch-29 queries. */
class Analytics47Spec extends AnyFunSuite with SharedSpark {

  test("wasserstein-1: equals the sorted-quantile transport on equal-mass") {
    val rev = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), expr("o_custkey = c_custkey"))
      .groupBy(col("c_nationkey"), col("o_orderdate").cast("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(2)))
    val tots = rev.groupBy(_._1).map { case (nk, g) => nk -> g.map(_._2).sum }
    val top2 = tots.toSeq.sortBy(t => (-t._2, t._1)).take(2).map(_._1)
    val a = rev.filter(_._1 == top2(0)).map(_._2).sorted
    val b = rev.filter(_._1 == top2(1)).map(_._2).sorted
    // census-integral reference
    val vals = (a ++ b).distinct.sorted
    var (ca, cb) = (0L, 0L)
    var num = BigInt(0)
    vals.sliding(2).foreach { case Array(v, vNext) =>
      ca += a.count(_ == v); cb += b.count(_ == v)
      num += BigInt(vNext - v) * (BigInt(ca) * b.length - BigInt(cb) * a.length).abs
    }
    val expected = (num * 1000000 / (BigInt(a.length) * b.length)).toLong
    val row = Analytics47.qWasserstein1(spark, sfDir).collect().head
    assert(row.getLong(0) == a.length.toLong && row.getLong(1) == b.length.toLong)
    assert(row.getLong(2) == expected)
    // when |A| = |B|, W1 = mean |sorted_a - sorted_b| exactly
    if (a.length == b.length) {
      val direct = a.zip(b).map(t => math.abs(t._1 - t._2).toDouble).sum / a.length
      assert(math.abs(row.getLong(2) / 1e6 - direct) < 1.0)
    }
  }

  test("rbo: depth-term replay; bounded by [0, 1]") {
    val toks = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        .map(w => (r.getLong(0) % 2, w)))
    def top(par: Long): Seq[String] = toks.filter(_._1 == par).groupBy(_._2)
      .map { case (w, g) => (w, g.length) }.toSeq
      .sortBy(t => (-t._2, t._1)).take(50).map(_._1)
    val (ta, tb) = (top(0), top(1))
    val ra = ta.zipWithIndex.map { case (w, i) => w -> (i + 1) }.toMap
    val rb = tb.zipWithIndex.map { case (w, i) => w -> (i + 1) }.toMap
    val expected = (1 to 50).map { dep =>
      val xd = (ra.keySet ++ rb.keySet).count(w =>
        ra.getOrElse(w, 99) <= dep && rb.getOrElse(w, 99) <= dep)
      math.round(0.1 * math.pow(0.9, dep - 1) * xd / dep * 1e6)
    }.sum
    val row = Analytics47.qRbo(spark, sfDir).collect().head
    assert(row.getLong(0) == expected)
    assert(row.getLong(0) >= 0 && row.getLong(0) <= 1000000L)
    // overlap@50 replay
    val x50 = (ra.keySet ++ rb.keySet).count(w => ra.contains(w) && rb.contains(w))
    assert(row.getLong(1) == x50.toLong)
  }

  test("cvar: tail mean replay; cvar <= var") {
    val xs = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(_.getLong(1)).sorted
    val n = xs.length
    val m = (n + 19) / 20
    val varC = xs(m - 1)
    val below = xs.filter(_ < varC)
    val cvar = (below.map(BigInt(_)).sum + BigInt(m - below.length) * varC) / m
    val row = Analytics47.qCvar(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == varC)
    assert(row.getLong(2) == cvar.toLong)
    assert(row.getLong(2) <= row.getLong(1))
  }
}
