package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics29

/** Independent in-memory referees for the r9 batch-11 queries. */
class Analytics29Spec extends AnyFunSuite with SharedSpark {

  private def dailyRev(): IndexedSeq[(String, Long)] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").cast("string").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toIndexedSeq

  test("rolling median: sliding-window lower-median replay") {
    val daily = dailyRev()
    val expected = daily.indices.map { i =>
      val win = daily.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
      (daily(i)._1, daily(i)._2, win((win.length + 1) / 2 - 1), win.length.toLong)
    }
    val got = Analytics29.qRollingMedian(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toIndexedSeq
    assert(got == expected)
  }

  test("kruskal-wallis: H replay from scratch ranks (double reference within slack)") {
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = vals.length.toLong
    // average ranks with ties, as doubles (independent of the query's
    // integer-census construction)
    val sorted = vals.map(_._2).sorted
    val firstIdx = sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
      v -> (g.map(_._2).min + 1, g.length)
    }
    val avgRank = firstIdx.map { case (v, (minR, c)) => v -> (minR + (c - 1) / 2.0) }
    val groups = vals.groupBy(_._1)
    val a = groups.values.map { g =>
      val s = g.map(t => avgRank(t._2)).sum
      s * s / g.length
    }.sum
    val h = 12.0 / (n * (n + 1)) * a - 3 * (n + 1)
    val tSum = firstIdx.values.map { case (_, c) => c.toDouble * c * c - c }.sum
    val hCorr = h / (1.0 - tSum / (n.toDouble * n * n - n))
    val row = Analytics29.qKruskalWallis(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == groups.size.toLong)
    // floor-div receipts allow a few micro-units of slack vs the double path
    assert(math.abs(row.getLong(2) - h * 1e6) < 50.0,
      s"h_micro ${row.getLong(2)} vs ${h * 1e6}")
    assert(math.abs(row.getLong(3) - hCorr * 1e6) < 50.0,
      s"h_corr_micro ${row.getLong(3)} vs ${hCorr * 1e6}")
    // ties only deflate H's denominator: corrected H must not shrink
    assert(row.getLong(3) >= row.getLong(2))
  }

  test("welch t: statistic and Satterthwaite df replay") {
    val bal = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def stats(seg: String): (Long, Double, Double) = {
      val xs = bal.filter(_._1 == seg).map(_._2.toDouble)
      val n = xs.length
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n.toLong, m, v)
    }
    val (n1, m1, v1) = stats("BUILDING")
    val (n2, m2, v2) = stats("MACHINERY")
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val df = se2 * se2 / (v1 / n1 * (v1 / n1) / (n1 - 1) + v2 / n2 * (v2 / n2) / (n2 - 1))
    val row = Analytics29.qWelchTtest(spark, sfDir).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - t) < 1e-4)
    assert(math.abs(row.getDouble(3) - df) < 1e-2)
    // Satterthwaite df is bracketed by min(n1,n2)-1 and n1+n2-2
    assert(row.getDouble(3) >= math.min(n1, n2) - 1 - 1e-6)
    assert(row.getDouble(3) <= n1 + n2 - 2 + 1e-6)
  }

  test("ndcg@10: full DCG/IDCG replay with literal discounts") {
    val discounts = Map(1 -> 1000000L, 2 -> 630930L, 3 -> 500000L, 4 -> 430677L,
      5 -> 386853L, 6 -> 356207L, 7 -> 333333L, 8 -> 315465L, 9 -> 301030L,
      10 -> 289065L)
    val cnts = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = cust.groupBy(_._1).map { case (seg, g) =>
      val graded = g.map { case (_, ck, bc) =>
        val rel = math.min(cnts.getOrElse(ck, 0L) / 4, 3L)
        (ck, bc, (1L << rel) - 1)
      }
      val dcg = graded.sortBy(t => (-t._2, t._1)).take(10).zipWithIndex
        .map { case ((_, _, gain), i) => gain * discounts(i + 1) }.sum
      val idcg = graded.sortBy(t => (-t._3, t._1)).take(10).zipWithIndex
        .map { case ((_, _, gain), i) => gain * discounts(i + 1) }.sum
      seg -> ((dcg, idcg, dcg * 1000000L / idcg))
    }
    val got = Analytics29.qNdcg(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    got.values.foreach { case (_, _, ppm) => assert(ppm > 0 && ppm <= 1000000L) }
  }

  test("brier decomposition: train/test rate replay, identity bounds") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_orderstatus") === "F").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val train = o.filter(_._2 % 2 == 0).groupBy(_._1)
      .map { case (b, g) => b -> g.map(_._3).sum * 1000000L / g.length }
    val test = o.filter(_._2 % 2 == 1).groupBy(_._1)
      .map { case (b, g) =>
        b -> ((g.length.toLong, g.map(_._3).sum * 1000000L / g.length))
      }
    val gPpm = {
      val t = o.filter(_._2 % 2 == 1)
      t.map(_._3).sum * 1000000L / t.length
    }
    val got = Analytics29.qBrierDecomp(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.keySet == test.keySet.intersect(train.keySet))
    got.foreach { case (b, (n, phat, ybar, g, rel, res)) =>
      assert(n == test(b)._1)
      assert(phat == train(b))
      assert(ybar == test(b)._2)
      assert(g == gPpm)
      assert(rel == (phat - ybar) * (phat - ybar))
      assert(res == (ybar - g) * (ybar - g))
    }
  }

  test("pvm decomposition: bridge identity holds exactly per brand") {
    val rows = Analytics29.qPvmDecomp(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rev0, rev1) = (r.getLong(1), r.getLong(2))
      val (vol, mix, price, resid) =
        (r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(vol + mix + price + resid == rev1 - rev0)
      // floor-div truncation receipts are bounded: each of the three
      // effects floors at most once against a positive denominator
      assert(math.abs(resid) <= 3)
    }
    // independent recompute of one brand's effects from raw data
    val li = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), expr("l_orderkey = o_orderkey"))
      .join(Tables.part(spark, sfDir), expr("l_partkey = p_partkey"))
      .filter(expr("year(CAST(o_orderdate AS DATE)) IN (1995, 1996)"))
      .groupBy(col("p_brand"), expr("year(CAST(o_orderdate AS DATE))").as("yr"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val brands = li.keys.filter(_._2 == 1995).map(_._1)
      .filter(b => li.contains((b, 1996))).toSeq.sorted
    val tq0 = brands.map(b => li((b, 1995))._2).sum
    val tq1 = brands.map(b => li((b, 1996))._2).sum
    val b0 = brands.head
    val (rev0, q0) = li((b0, 1995)); val (rev1, q1) = li((b0, 1996))
    val volE = BigInt(rev0) * (tq1 - tq0) / tq0
    val mixE = BigInt(rev0) * q1 / q0 - BigInt(rev0) * tq1 / tq0
    val priceE = BigInt(rev1) - BigInt(rev0) * q1 / q0
    val r0 = rows.find(_.getString(0) == b0).get
    assert(r0.getLong(5) == volE.toLong)
    assert(r0.getLong(6) == mixE.toLong)
    assert(r0.getLong(7) == priceE.toLong)
  }
}
