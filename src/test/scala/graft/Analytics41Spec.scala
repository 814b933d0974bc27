package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics41

/** Independent in-memory referees for the r9 batch-23 queries. */
class Analytics41Spec extends AnyFunSuite with SharedSpark {

  private def daily(): IndexedSeq[Long] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1)).toIndexedSeq

  test("hill tail: top-k log-ratio replay") {
    val prices = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    val top = prices.take(101)
    val xRef = top.last
    val sumLn = top.take(100)
      .map(p => math.round(math.log(p.toDouble / xRef) * 1e6)).sum
    val row = Analytics41.qHillTail(spark, sfDir).collect().head
    assert(row.getLong(0) == 100L)
    assert(row.getLong(1) == sumLn)
    assert(row.getLong(2) == 100L * 1000000L * 1000000L / sumLn)
    // a finite positive tail index
    assert(row.getLong(2) > 0)
  }

  test("qq normal: rank selection + literal z line") {
    val ys = daily().sorted
    val n = ys.length
    val mean = ys.map(_.toDouble).sum / n
    val sd = math.sqrt(ys.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val rows = Analytics41.qQqNormal(spark, sfDir).collect()
    assert(rows.length == 19)
    rows.foreach { r =>
      val step = r.getLong(0).toInt
      assert(r.getLong(1) == ys(((step * n + 19) / 20 - 1).toInt))
    }
    // median point: theoretical equals the mean (z = 0)
    val mid = rows.find(_.getLong(0) == 10L).get
    assert(math.abs(mid.getDouble(2) - mean) < 1e-3)
    // empirical quantiles are non-decreasing in step
    rows.map(_.getLong(1)).sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    val _ = sd
  }

  test("we rules: scalar replay of all four rules") {
    val ys = daily()
    val n = ys.length
    val sx = ys.map(BigInt(_)).sum
    val mrs = ys.sliding(2).map(p => (p(1) - p(0)).abs).toIndexedSeq
    val smr = mrs.map(BigInt(_)).sum
    val nmr = mrs.length
    def dev(x: Long) = (BigInt(x) * n - sx) * 1128 * nmr
    val unit = BigInt(1000) * smr * n
    val side = ys.map(x => if (dev(x) >= 0) 1 else -1)
    val z3 = ys.map(x => dev(x).abs > unit * 3)
    val z2 = ys.map(x => dev(x).abs > unit * 2)
    val z1 = ys.map(x => dev(x).abs > unit)
    val r1 = z3.count(identity).toLong
    def windows(k: Int)(pred: Range => Boolean): Long =
      ys.indices.count(i => pred(math.max(0, i - k + 1) to i)).toLong
    val r2 = windows(3)(w => w.count(i => z2(i) && side(i) == 1) >= 2 ||
      w.count(i => z2(i) && side(i) == -1) >= 2)
    val r3 = windows(5)(w => w.count(i => z1(i) && side(i) == 1) >= 4 ||
      w.count(i => z1(i) && side(i) == -1) >= 4)
    val r4 = ys.indices.count(i => i >= 7 &&
      math.abs((i - 7 to i).map(side).sum) == 8).toLong
    val row = Analytics41.qWeRules(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((r1, r2, r3, r4)))
  }

  test("variance ratio: diff-moment replay; near 1 is plausible") {
    val ys = daily().map(_.toDouble)
    val d1 = ys.sliding(2).map(p => p(1) - p(0)).toIndexedSeq.drop(4)
    val d5 = ys.indices.drop(5).map(i => ys(i) - ys(i - 5))
    // align: query keeps rows where d5 exists, so d1 over the same rows
    val a1 = ys.indices.drop(5).map(i => ys(i) - ys(i - 1))
    def varOf(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val expected = varOf(d5) / (5 * varOf(a1))
    val row = Analytics41.qVarianceRatio(spark, sfDir).collect().head
    assert(row.getLong(0) == a1.length.toLong)
    assert(math.abs(row.getDouble(1) - expected) < 1e-5)
    assert(row.getDouble(1) > 0)
    val _ = d1
  }

  test("turning points: count replay, z matches closed form") {
    val ys = daily()
    val t = (1 until ys.length - 1).count(i =>
      (ys(i) > ys(i - 1) && ys(i) > ys(i + 1)) ||
        (ys(i) < ys(i - 1) && ys(i) < ys(i + 1))).toLong
    val n = ys.length
    val z = (t - 2.0 * (n - 2) / 3) / math.sqrt((16.0 * n - 29) / 90)
    val row = Analytics41.qTurningPoints(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == t)
    assert(row.getLong(2) == BigInt(2) * (n - 2) * 1000000 / 3)
    assert(math.abs(row.getDouble(3) - z) < 1e-5)
  }
}
