package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics37

/** Independent in-memory referees for the r9 batch-19 queries. */
class Analytics37Spec extends AnyFunSuite with SharedSpark {

  private def daily(): IndexedSeq[Long] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1)).toIndexedSeq

  test("wavelet energy: three-level Haar replay; Parseval accounting") {
    val ys = daily()
    def level(xs: IndexedSeq[Long]): (IndexedSeq[Long], BigInt) = {
      val pairs = xs.grouped(2).filter(_.length == 2).toIndexedSeq
      (pairs.map(p => p(0) + p(1)),
        pairs.map(p => BigInt(p(0) - p(1)) * (p(0) - p(1))).sum)
    }
    val (a1, e1) = level(ys); val (a2, e2) = level(a1); val (_, e3) = level(a2)
    val row = Analytics37.qWaveletEnergy(spark, sfDir).collect().head
    assert(row.getLong(0) == ys.length.toLong)
    assert(math.abs(row.getDouble(1) - e1.toDouble) <= math.ulp(e1.toDouble))
    assert(math.abs(row.getDouble(2) - e2.toDouble) <= math.ulp(e2.toDouble))
    assert(math.abs(row.getDouble(3) - e3.toDouble) <= math.ulp(e3.toDouble))
  }

  test("pacf: Durbin-Levinson from scratch correlations") {
    val ys = daily().map(_.toDouble)
    def corrLag(k: Int): Double = {
      val a = ys.dropRight(k); val b = ys.drop(k)
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
        b.map(x => (x - mb) * (x - mb)).sum)
    }
    val r1 = corrLag(1); val r2 = corrLag(2)
    val row = Analytics37.qPacf(spark, sfDir).collect().head
    assert(math.abs(row.getDouble(0) - r1) < 1e-5)
    assert(math.abs(row.getDouble(1) - (r2 - r1 * r1) / (1 - r1 * r1)) < 1e-5)
    assert(math.abs(row.getDouble(0)) <= 1 && math.abs(row.getDouble(1)) <= 1)
  }

  test("grubbs: moment replay and z-max equivalence") {
    val xs = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0).toDouble)
    val n = xs.length
    val m = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    val g = xs.map(x => math.abs(x - m)).max / sd
    val row = Analytics37.qGrubbs(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(4) - g) < 1e-5)
    assert(row.getString(3) == (if (xs.max - m >= m - xs.min) "high" else "low"))
  }

  test("lead-lag: lag-0 matches a direct correlation of the joined series") {
    val rows = Analytics37.qLeadLag(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == 29)
    assert(rows.map(_._4).sum == 1)  // exactly one best row
    assert(rows.map(_._1).toSeq == (-14L to 14L))
    // the best row carries the max r (ties impossible under 6dp? allow eq)
    val best = rows.find(_._4 == 1L).get
    assert(rows.forall(t => t._3 <= best._3))
    // overlap count shrinks (weakly) as |lag| grows from the fullest point
    val n0 = rows.find(_._1 == 0L).get._2
    rows.foreach(t => assert(t._2 <= n0 + 14))
  }

  test("sax motifs: symbol census replay") {
    val ys = daily()
    val n = ys.length
    val mean = ys.map(BigDecimal(_)).sum.toDouble / n
    val sd = math.sqrt(ys.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val bp = 0.6744897501960817
    val syms = ys.map { x =>
      val z = (x - mean) / sd
      if (z < -bp) "a" else if (z < 0.0) "b" else if (z < bp) "c" else "d"
    }
    val motifs = syms.sliding(3).filter(_.length == 3).map(_.mkString).toSeq
    val expected = motifs.groupBy(identity).map { case (m, g) => (m, g.size.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = Analytics37.qSaxMotifs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }
}
