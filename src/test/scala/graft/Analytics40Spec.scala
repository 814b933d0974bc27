package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics40

/** Independent in-memory referees for the r9 batch-22 queries. */
class Analytics40Spec extends AnyFunSuite with SharedSpark {

  test("woe/iv: decile census replay; WOE signs track bad-rate vs base") {
    val o = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"), col("o_orderkey"),
        (col("o_orderstatus") === "F").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val n = o.length
    // ntile semantics: first (n % 10) bins get one extra row
    val base = n / 10; val extra = n % 10
    var idx = 0
    val cells = (1 to 10).map { b =>
      val sz = base + (if (b <= extra) 1 else 0)
      val g = o.slice(idx, idx + sz); idx += sz
      (b.toLong, g.length.toLong, g.map(_._3).sum)
    }
    val bTot = cells.map(_._3).sum
    val gTot = cells.map(t => t._2 - t._3).sum
    val got = Analytics40.qWoeIv(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    cells.foreach { case (b, nn, bad) =>
      val good = nn - bad
      val woe = math.round(math.log((bad.toDouble / bTot) / (good.toDouble / gTot)) * 1e6)
      val iv = (bad * 1000000L / bTot - good * 1000000L / gTot) * woe
      assert(got(b) == ((nn, bad, good, woe, iv)))
      // IV contributions are non-negative: (pb-pg) and ln(pb/pg) share sign
      assert(iv >= 0)
    }
  }

  test("decile migration: row shares sum to ~1e6, diagonal dominates uniform") {
    val rows = Analytics40.qDecileMigration(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - g.length)
    }
    // replay one cell from raw data
    val rev = Tables.orders(spark, sfDir)
      .filter(expr("year(CAST(o_orderdate AS DATE)) IN (1995, 1996)"))
      .groupBy(col("o_custkey"), expr("year(CAST(o_orderdate AS DATE))"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def dec(yr: Int): Map[Long, Long] = {
      val g = rev.filter(_._2 == yr).sortBy(t => (-t._3, t._1))
      val n = g.length; val base = n / 10; val extra = n % 10
      var idx = 0
      (1 to 10).flatMap { b =>
        val sz = base + (if (b <= extra) 1 else 0)
        val out = g.slice(idx, idx + sz).map(_._1 -> b.toLong); idx += sz; out
      }.toMap
    }
    val d95 = dec(1995); val d96 = dec(1996)
    val expected = d95.keys.filter(d96.contains)
      .groupBy(ck => (d95(ck), d96(ck))).map { case (k, g) => k -> g.size.toLong }
    val gotCells = rows.map(t => (t._1, t._2) -> t._3).toMap
    assert(gotCells == expected)
  }

  test("newsvendor: fractile pick minimizes cost among neighbors") {
    val dems = Tables.lineitem(spark, sfDir)
      .groupBy(expr("CAST(l_shipdate AS DATE)"))
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("d"))
      .collect().map(_.getLong(1)).sorted
    val n = dems.length
    val qStar = dems((n * 4 + 4) / 5 - 1 max 0) // smallest with upto*5 >= n*4
    // recompute via census logic to be exact
    val qs = dems.distinct.sorted.find(q => dems.count(_ <= q) * 5 >= n * 4).get
    def cost(q: Long) = 4L * dems.map(d => math.max(0L, d - q)).sum +
      dems.map(d => math.max(0L, q - d)).sum
    val row = Analytics40.qNewsvendor(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == qs)
    assert(row.getLong(2) == dems.map(d => math.max(0L, qs - d)).sum)
    assert(row.getLong(3) == dems.map(d => math.max(0L, d - qs)).sum)
    assert(row.getLong(4) == cost(qs))
    // the 0.8 fractile is cost-optimal at cu:co = 4:1 among neighbors
    val lower = dems.filter(_ < qs).lastOption
    val higher = dems.filter(_ > qs).headOption
    lower.foreach(q => assert(cost(qs) <= cost(q)))
    higher.foreach(q => assert(cost(qs) <= cost(q)))
    val _ = qStar
  }
}
