package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics26

/** Independent in-memory referees for the r9 batch-8 queries: each test
  * recomputes the statistic from raw collected rows with plain Scala
  * (no Spark expressions shared with the query under test).
  */
class Analytics26Spec extends AnyFunSuite with SharedSpark {

  private def epochDay(d: java.sql.Date): Long = d.toLocalDate.toEpochDay

  test("max drawdown: per-nation sequential replay") {
    val daily = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").cast("date").cast("string").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (nation, rows) =>
      var cum = 0L; var peak = 0L; var maxDd = 0L; var trough = ""
      rows.sortBy(_._2).foreach { case (_, day, rev) =>
        cum += rev
        if (cum > peak) peak = cum
        val dd = peak - cum
        if (dd > maxDd || trough.isEmpty) { maxDd = dd; trough = day }
      }
      nation -> ((maxDd, trough))
    }
    val got = Analytics26.qMaxDrawdown(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // referee keeps the FIRST day attaining each new max (dd > maxDd), and
    // seeds trough with the first day — same first-attainment tiebreak
    assert(got == expected)
  }

  test("capture-recapture: Chapman estimator replay and bounds") {
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val occs = rows.map(r => epochDay(r.getDate(1)) % 2).toSet
        (u, occs.contains(0L), occs.contains(1L))
      }
    val nA = perUser.count(_._2).toLong
    val nB = perUser.count(_._3).toLong
    val m = perUser.count(t => t._2 && t._3).toLong
    val nHat = (nA + 1) * (nB + 1) / (m + 1) - 1
    val row = Analytics26.qCaptureRecapture(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((nA, nB, m)))
    assert(row.getLong(4) == nHat)
    // the estimate can never fall below the seen population
    assert(nHat >= perUser.size)
    assert(row.getLong(5) == perUser.size.toLong * 1000000L / nHat)
  }

  test("mcnemar: discordant-cell replay, chi-square call") {
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .collect()
      .groupBy(_.getLong(0))
      .toSeq // Map#map over 2-tuples would dedup by key — keep all users
      .map { case (_, rows) =>
        val wds = rows.map(r => (epochDay(r.getDate(1)) + 3) % 7).toSet
        (wds.exists(_ < 5), wds.exists(_ >= 5))
      }
    val b = perUser.count(t => t._1 && !t._2).toLong
    val c = perUser.count(t => !t._1 && t._2).toLong
    val both = perUser.count(t => t._1 && t._2).toLong
    val stat = if (b + c == 0) 0L else (b - c) * (b - c) * 1000000L / (b + c)
    val row = Analytics26.qMcnemar(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((both, b, c)))
    assert(row.getLong(3) == stat)
    assert(row.getLong(4) == (if (stat > 3841459L) 1L else 0L))
  }

  test("kendall tau-b: quadratic pair replay, [-1,1] bound") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    var conc = 0L; var disc = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val s = java.lang.Long.signum(daily(i)._1 - daily(j)._1) *
        java.lang.Long.signum(daily(i)._2 - daily(j)._2)
      if (s > 0) conc += 1 else if (s < 0) disc += 1
    }
    val n = daily.length.toLong
    val n0 = n * (n - 1) / 2
    val tx = daily.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val ty = daily.groupBy(_._2).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val tau = BigDecimal((conc - disc).toDouble / math.sqrt((n0 - tx).toDouble) /
      math.sqrt((n0 - ty).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Analytics26.qKendallTau(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((conc, disc, n0)))
    assert((row.getLong(3), row.getLong(4)) == ((tx, ty)))
    assert(math.abs(row.getDouble(5) - tau) < 1e-9)
    assert(row.getDouble(5) >= -1.0 && row.getDouble(5) <= 1.0)
  }
}
