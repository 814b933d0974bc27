package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics39

/** Independent in-memory referees for the r9 batch-21 queries. */
class Analytics39Spec extends AnyFunSuite with SharedSpark {

  test("kendall w: dense-block rank replay; W in [0,1]") {
    val rev = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), expr("o_custkey = c_custkey"))
      .groupBy(col("c_nationkey"), month(col("o_orderdate").cast("date")))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getLong(2)))
    val topK = rev.groupBy(_._1).map { case (nk, g) => (nk, g.map(_._3).sum) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(5).map(_._1)
    val months = rev.map(_._2).distinct.sorted
    val n = months.length; val k = topK.length
    val rsum2 = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    topK.foreach { nk =>
      val vs = months.map(m =>
        m -> rev.find(t => t._1 == nk && t._2 == m).map(_._3).getOrElse(0L))
      vs.foreach { case (m, v) =>
        val below = vs.count(_._2 < v); val ties = vs.count(_._2 == v)
        rsum2(m) += 2L * (below + 1) + ties - 1
      }
    }
    val s4 = months.map(m => BigInt(rsum2(m) - k.toLong * (n + 1))
      .pow(2)).sum
    val wPpm = (BigInt(3) * s4 * 1000000 /
      (BigInt(k) * k * (BigInt(n) * n * n - n))).toLong
    val row = Analytics39.qKendallW(spark, sfDir).collect().head
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(row.getLong(2) == wPpm)
    assert(row.getLong(2) >= 0 && row.getLong(2) <= 1000000L)
    assert(row.getLong(3) == k * (n - 1) * wPpm)
  }

  test("price index: Laspeyres/Paasche replay; Fisher between them") {
    val py = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), expr("l_orderkey = o_orderkey"))
      .filter(expr("year(CAST(o_orderdate AS DATE)) IN (1995, 1996)"))
      .groupBy(col("l_partkey"), expr("year(CAST(o_orderdate AS DATE))"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val pks = py.keys.filter(_._2 == 1995).map(_._1)
      .filter(pk => py.contains((pk, 1996))).toSeq
    val dL = pks.map(pk => py((pk, 1995))._1).sum
    val nP = pks.map(pk => py((pk, 1996))._1).sum
    val nLmc = pks.map { pk =>
      BigInt(py((pk, 1996))._1) * py((pk, 1995))._2 * 1000000 / py((pk, 1996))._2
    }.sum
    val dPmc = pks.map { pk =>
      BigInt(py((pk, 1995))._1) * py((pk, 1996))._2 * 1000000 / py((pk, 1995))._2
    }.sum
    val l = (nLmc / dL).toLong
    val p = (BigInt(nP) * BigInt("1000000000000") / dPmc).toLong
    val row = Analytics39.qPriceIndex(spark, sfDir).collect().head
    assert(row.getLong(0) == pks.size.toLong)
    assert(row.getLong(1) == l && row.getLong(2) == p)
    assert(row.getLong(3) == math.round(math.sqrt(l.toDouble * p)))
    // Fisher lies between its factors
    val (lo, hi) = (math.min(l, p), math.max(l, p))
    assert(row.getLong(3) >= lo - 1 && row.getLong(3) <= hi + 1)
  }

  test("cpk: rank limits + moment replay; cpk <= cp") {
    val xs = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(_.getLong(1)).sorted
    val n = xs.length
    val lsl = xs((n + 19) / 20 - 1); val usl = xs((19 * n + 19) / 20 - 1)
    val m = xs.map(_.toDouble).sum / n
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    val row = Analytics39.qCpk(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == lsl && row.getLong(2) == usl)
    assert(math.abs(row.getDouble(3) - (usl - lsl) / (6 * sd)) < 1e-5)
    assert(math.abs(row.getDouble(4) - math.min(usl - m, m - lsl) / (3 * sd)) < 1e-5)
    assert(row.getDouble(4) <= row.getDouble(3) + 1e-12)
  }

  test("seasonal strength: in [0,1]; equals 1 - var ratio of the pipeline") {
    val row = Analytics39.qSeasonalStrength(spark, sfDir).collect().head
    val fs = row.getDouble(1)
    assert(fs >= 0 && fs <= 1)
    // replay from the decompose query itself
    val dec = graft.queries.Analytics30.qSeasonalDecompose(spark, sfDir)
      .filter(col("residual_c").isNotNull)
      .select((col("rev_c") - col("trend_c")).as("dt"), col("residual_c"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val n = dec.length
    def varOf(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val expected = math.max(0.0, 1 - varOf(dec.map(_._2)) / varOf(dec.map(_._1)))
    assert(math.abs(fs - expected) < 1e-5)
    assert(row.getLong(0) == n.toLong)
  }
}
