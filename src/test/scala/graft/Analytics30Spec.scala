package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics30

/** Independent in-memory referees for the r9 batch-12 queries. */
class Analytics30Spec extends AnyFunSuite with SharedSpark {

  private def priceByGroup(): Map[String, Array[Long]] =
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, a) => g -> a.map(_._2) }

  private def anovaF(groups: Iterable[Array[Double]]): Double = {
    val all = groups.flatten
    val n = all.size; val k = groups.size
    val gm = all.sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum }).sum
    (ssb / (k - 1)) / (ssw / (n - k))
  }

  test("anova: F and eta2 replay from doubles") {
    val gs = priceByGroup()
    val f = anovaF(gs.values.map(_.map(_.toDouble)))
    val row = Analytics30.qAnovaOneway(spark, sfDir).collect().head
    assert(row.getLong(0) == gs.values.map(_.length).sum.toLong)
    assert(row.getLong(1) == gs.size.toLong)
    assert(math.abs(row.getDouble(2) - f) < 1e-3, s"F ${row.getDouble(2)} vs $f")
    // eta2 ppm from the same double pieces
    val all = gs.values.flatten.map(_.toDouble)
    val gm = all.sum / all.size
    val sst = all.map(x => (x - gm) * (x - gm)).sum
    val ssb = gs.values.map(g => g.length * math.pow(g.map(_.toDouble).sum / g.length - gm, 2)).sum
    assert(math.abs(row.getLong(3) - ssb / sst * 1e6) < 5)
  }

  test("brown-forsythe: W replay on median-centered deviations") {
    val gs = priceByGroup()
    val devs = gs.values.map { g =>
      val sorted = g.sorted
      val med = sorted((sorted.length + 1) / 2 - 1)
      g.map(x => math.abs(x - med).toDouble)
    }
    val w = anovaF(devs)
    val row = Analytics30.qLeveneBf(spark, sfDir).collect().head
    assert(row.getLong(0) == gs.values.map(_.length).sum.toLong)
    assert(math.abs(row.getDouble(2) - w) < 1e-3, s"W ${row.getDouble(2)} vs $w")
  }

  test("cvm: census form equals the textbook row-rank form") {
    val xs = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // combined sort with A-before-R tie order, then U = nΣ(r_i-i)² + mΣ(s_j-j)²
    val sorted = xs.sortBy(t => (t._2, t._1))
    var i = 0L; var j = 0L; var ua = BigInt(0); var ur = BigInt(0)
    sorted.zipWithIndex.foreach { case ((f, _), idx) =>
      val rank = idx + 1L
      if (f == "A") { i += 1; ua += BigInt(rank - i) * (rank - i) }
      else { j += 1; ur += BigInt(rank - j) * (rank - j) }
    }
    val n = i; val m = j; val nTot = n + m
    val u = BigInt(n) * ua + BigInt(m) * ur
    val tMicro = (u * 1000000 / (BigInt(n) * BigInt(m) * nTot)
      - (BigInt(4) * n * m - 1) * 1000000 / (BigInt(6) * nTot)).toLong
    val row = Analytics30.qCvmTest(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((n, m)))
    assert(row.getLong(2) == tMicro)
    // E[T] under H0 is (1+1/N)/6 ≈ 0.1667 — same-distribution samples land near it
    assert(row.getLong(2) > 0 && row.getLong(2) < 1500000L)
  }

  test("seasonal decompose: trend/seasonal/residual replay") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1).toIndexedSeq
    // ROWS-frame semantics: 7 frame rows, calendar gaps notwithstanding
    val trend = daily.indices.map { ix =>
      if (ix < 3 || ix >= daily.length - 3) None
      else Some(daily.slice(ix - 3, ix + 4).map(_._2).sum / 7)
    }
    val det = daily.indices.map(ix => trend(ix).map(daily(ix)._2 - _))
    val seas = daily.indices.groupBy(ix => daily(ix)._1 % 7).map { case (dw, idxs) =>
      val ds = idxs.flatMap(det(_))
      // Long / truncates toward zero — same convention as both engines
      dw -> ds.sum / ds.length
    }
    val got = Analytics30.qSeasonalDecompose(spark, sfDir).collect()
    assert(got.length == daily.length)
    got.zipWithIndex.foreach { case (r, ix) =>
      assert(java.time.LocalDate.parse(r.getString(0)).toEpochDay == daily(ix)._1)
      assert(r.getLong(1) == daily(ix)._2)
      val expTrend = trend(ix)
      assert(Option(if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)))
        .map(_.toLong) == expTrend)
      assert(r.getLong(3) == daily(ix)._1 % 7)
      assert(r.getLong(4) == seas(daily(ix)._1 % 7))
      if (expTrend.isDefined)
        assert(r.getLong(5) == daily(ix)._2 - expTrend.get - seas(daily(ix)._1 % 7))
      else assert(r.isNullAt(5))
    }
  }

  test("partial corr: matrix-inverse replay within rounding slack") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble,
        r.getLong(2).toDouble, r.getString(3)))
    def pearson(xs: Array[Double], ys: Array[Double]): Double = {
      val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.indices.map(i => (xs(i) - mx) * (ys(i) - my)).sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      cov / math.sqrt(vx * vy)
    }
    val expected = rows.groupBy(_._4).map { case (flag, g) =>
      val x = g.map(_._1); val y = g.map(_._2); val z = g.map(_._3)
      val rxy = pearson(x, y); val rxz = pearson(x, z); val ryz = pearson(y, z)
      flag -> ((rxy, (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))))
    }
    val got = Analytics30.qPartialCorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (f, (rxy, pc)) =>
      assert(math.abs(rxy - expected(f)._1) < 1e-5)
      assert(math.abs(pc - expected(f)._2) < 1e-5)
      assert(pc >= -1 && pc <= 1)
    }
  }

  test("control chart: limits and violation counts replay") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val revs = daily.map(_._2)
    val mrs = revs.sliding(2).map(p => math.abs(p(1) - p(0))).toArray
    val xbar = revs.sum / revs.length
    val mrbar = mrs.sum / mrs.length
    val ucl = xbar + 2660 * mrbar / 1000
    val lcl = xbar - 2660 * mrbar / 1000
    val row = Analytics30.qControlChart(spark, sfDir).collect().head
    assert(row.getLong(0) == revs.length.toLong)
    assert(row.getLong(1) == xbar)
    assert(row.getLong(2) == mrbar)
    assert(row.getLong(3) == ucl && row.getLong(4) == lcl)
    assert(row.getLong(5) == revs.count(_ > ucl).toLong)
    assert(row.getLong(6) == revs.count(_ < lcl).toLong)
  }
}
