package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics27

/** Independent in-memory referees for the r9 batch-9 queries. */
class Analytics27Spec extends AnyFunSuite with SharedSpark {

  test("harmonic centrality: reference BFS from each seed") {
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).map { case (_, g) => g.map(_._2).toSet }
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    byOrder.foreach { ps =>
      for (a <- ps; b <- ps if a != b)
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
    }
    val seeds = items.groupBy(_._2).map { case (p, g) => (p, g.length) }.toSeq
      .sortBy { case (p, deg) => (-deg, p) }.take(20).map(_._1)
    val expected = seeds.map { s0 =>
      val hop = scala.collection.mutable.Map(s0 -> 0)
      var frontier = Set(s0)
      for (h <- 1 to 3) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(hop.contains)
        frontier.foreach(n => hop(n) = h)
      }
      val reached = hop.filter(_._2 > 0)
      s0 -> ((reached.size.toLong, reached.values.map(6L / _).sum))
    }.toMap
    val got = Analytics27.qHarmonicCentrality(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("hodges-lehmann: sorted Walsh-sum selection") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .collect().map(_.getLong(1))
    val sums = (for (i <- daily.indices; j <- i until daily.length)
      yield daily(i) + daily(j)).sorted
    val med = sums((sums.length + 1) / 2 - 1)
    val row = Analytics27.qHodgesLehmann(spark, sfDir).collect().head
    assert(row.getLong(0) == sums.length.toLong)
    assert(row.getLong(1) == med)
    assert(row.getLong(2) == med / 2)
  }

  test("poisson dispersion: moment replay and decision-squaring identity") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, g) =>
      val xs = g.map(_._2); val n = xs.length.toLong
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val d = (n * sxx - sx * sx) * 1000000L / sx
      // referee decides via the plain sqrt inequality the query squared away
      val over = d.toDouble / 1e6 > (n - 1) + 2.0 * math.sqrt(2.0 * (n - 1))
      t -> ((n, sx, d, if (over) 1L else 0L))
    }
    val got = Analytics27.qPoissonDispersion(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }

  test("rolling correlation: sliding-window replay, [-1,1] bound") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val expected = (29 until daily.length).map { j =>
      val win = daily.slice(j - 29, j + 1)
      val n = 30L
      val sx = win.map(_._2).sum; val sy = win.map(_._3).sum
      val sxx = win.map(t => t._2 * t._2).sum
      val syy = win.map(t => t._3 * t._3).sum
      val sxy = win.map(t => t._2 * t._3).sum
      val r = BigDecimal((n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble) /
        math.sqrt((n * syy - sy * sy).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      daily(j)._1 -> r
    }.toMap
    val got = Analytics27.qRollingCorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (day, r) =>
      assert(math.abs(r - expected(day)) < 1e-9, day)
      assert(r >= -1.0 && r <= 1.0)
    }
  }

  test("cumulative gains: decile census replay, gains monotone to 1e6") {
    val perUser = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("score"),
        max((col("event_type") === "purchase").cast("long")).as("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    val n = perUser.length
    val big = n % 10; val bigSz = n / 10 + 1
    val byDecile = perUser.zipWithIndex.groupBy { case (_, i) =>
      if (big > 0 && i < big * bigSz) i / bigSz
      else (i - big * bigSz) / (n / 10) + big
    }.toSeq.sortBy(_._1)
    val posTotal = perUser.map(_._3).sum
    var cumN = 0L; var cumPos = 0L
    val expected = byDecile.map { case (dec, g) =>
      cumN += g.length; cumPos += g.map(_._1._3).sum
      (dec + 1).toLong -> ((g.length.toLong, g.map(_._1._3).sum,
        cumPos * 1000000L / posTotal,
        cumPos * n * 1000000L / (posTotal * cumN)))
    }.toMap
    val got = Analytics27.qCumGains(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
    // gains curve ends at exactly 100% of purchasers
    assert(got(10L)._3 == 1000000L)
  }
}
