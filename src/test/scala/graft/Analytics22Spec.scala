package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics22

/** In-memory referees for the r9 batch-4 operators. */
class Analytics22Spec extends AnyFunSuite with SharedSpark {

  test("business days: closed form equals the naive weekday walk") {
    val pairs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        col("o_orderdate").cast("date").cast("string"),
        col("l_shipdate").cast("date").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // SIGNED weekday difference (the synthetic ship dates are not
    // ordered against order dates, and the query reports the signed
    // count — a reversed pair is negative, not clamped)
    def naiveBusdays(a: String, b: String): Long = {
      def walk(from: java.time.LocalDate, to: java.time.LocalDate): Long = {
        var d = from
        var n = 0L
        while (d.isBefore(to)) {
          d = d.plusDays(1)
          if (d.getDayOfWeek.getValue <= 5) n += 1 // 1=Mon..7=Sun
        }
        n
      }
      val (da, db) = (java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
      if (!db.isBefore(da)) walk(da, db) else -walk(db, da)
    }
    val expected = pairs.groupBy(_._1).map { case (p, g) =>
      val bus = g.map(x => naiveBusdays(x._2, x._3))
      p -> (g.length.toLong, bus.sum,
        bus.sum * 1000 / g.length, bus.max) // Scala / truncates, like both engines
    }
    val got = Analytics22.qBusinessDays(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("skew report: statistics match the naive key census") {
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey").count().collect().map(_.getLong(1))
    val r = Analytics22.qSkewReport(spark, sfDir).collect().head
    assert(r.getLong(0) == counts.length.toLong)
    assert(r.getLong(1) == counts.sum)
    assert(r.getLong(2) == counts.max)
    val sortedDesc = counts.sorted.reverse
    assert(r.getLong(3) == sortedDesc(math.max(counts.length / 100, 1) - 1))
    assert(r.getLong(4) == counts.max * 1000000L / counts.sum)
    val ssq = counts.map(c => BigInt(c) * c).sum
    assert(BigInt(r.getLong(5)) ==
      (ssq * 1000000) / (BigInt(counts.sum) * counts.sum))
  }

  test("stratified split: proportions exact per stratum, assignment stable") {
    val rows = Analytics22.qStratifiedSplit(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2), r.getLong(3)))
    val byStratum = rows.groupBy(_._1)
    byStratum.foreach { case (k, splits) =>
      val n = splits.map(_._3).sum
      val m = splits.map(s => s._2 -> s._3).toMap
      assert(m.getOrElse("train", 0L) == n * 80 / 100, s"$k train")
      assert(m.getOrElse("train", 0L) + m.getOrElse("val", 0L) == n * 90 / 100,
        s"$k val")
    }
    // determinism: re-run yields identical rows
    val again = Analytics22.qStratifiedSplit(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("JS divergence: non-negative, bounded by ln 2, replayed from bins") {
    val r = Analytics22.qJsDivergence(spark, sfDir).collect().head
    val js = r.getLong(3).toDouble / 1e6
    assert(js >= -1e-6, s"JS must be non-negative, got $js")
    assert(js <= math.log(2) + 1e-6, s"JS bounded by ln2, got $js")
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
  }

  test("calendar dim: covers the span, weekday anchor correct, census sums") {
    val rows = Analytics22.qCalendarDim(spark, sfDir).collect()
    assert(rows.length.toLong ==
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(rows.head.getString(0)),
        java.time.LocalDate.parse(rows.last.getString(0))) + 1,
      "contiguous day span")
    rows.foreach { r =>
      val d = java.time.LocalDate.parse(r.getString(0))
      assert(r.getLong(1) == d.getYear.toLong)
      assert(r.getLong(3) == d.getMonthValue.toLong)
      assert(r.getLong(4) == d.getDayOfWeek.getValue - 1,
        s"${r.getString(0)}: dow_mon0 ${r.getLong(4)}")
      assert((r.getLong(5) == 1L) == (d.getDayOfWeek.getValue >= 6))
    }
    assert(rows.map(_.getLong(6)).sum ==
      Tables.orders(spark, sfDir).count())
  }
}
