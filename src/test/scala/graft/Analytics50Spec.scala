package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics50

/** Independent in-memory referees for the r9 batch-32 queries. */
class Analytics50Spec extends AnyFunSuite with SharedSpark {

  test("meta pool: inverse-variance synthesis replay within quantization slack") {
    val rows = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getLong(2)))
    case class St(theta: Double, se2: Double)
    val studies = rows.groupBy(_._1).flatMap { case (_, g) =>
      val a = g.filter(_._2 == "BUILDING").map(_._3.toDouble)
      val b = g.filter(_._2 == "MACHINERY").map(_._3.toDouble)
      if (a.length >= 2 && b.length >= 2) {
        val (ma, mb) = (a.sum / a.length, b.sum / b.length)
        val ss = a.map(x => (x - ma) * (x - ma)).sum + b.map(x => (x - mb) * (x - mb)).sum
        val se2 = ss / (a.length + b.length - 2) * (1.0 / a.length + 1.0 / b.length)
        Some(St(ma - mb, se2))
      } else None
    }.toSeq
    val sw = studies.map(s => 1.0 / s.se2).sum
    val pooled = studies.map(s => s.theta / s.se2).sum / sw
    val q = studies.map(s => (s.theta - pooled) * (s.theta - pooled) / s.se2).sum
    val row = Analytics50.qMetaPool(spark, sfDir).collect().head
    assert(row.getLong(0) == studies.length.toLong)
    // 1e6-grid weight quantization allows small relative slack
    assert(math.abs(row.getDouble(1) - pooled) < math.abs(pooled) * 1e-4 + 0.01)
    assert(math.abs(row.getDouble(2) - math.sqrt(1 / sw)) < math.sqrt(1 / sw) * 1e-4 + 0.01)
    assert(math.abs(row.getDouble(3) - q) < math.abs(q) * 1e-3 + 0.01)
    assert(row.getDouble(4) >= 0 && row.getDouble(4) <= 1)
  }

  test("smr: stratified expected-count replay") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id") % 2 === 1, hour(col("ts")),
        (col("event_type") === "purchase").cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getInt(1), r.getLong(2)))
    val ref = ev.filter(!_._1).groupBy(_._2)
      .map { case (h, g) => h -> ((g.map(_._3).sum, g.length.toLong)) }
    val coh = ev.filter(_._1).groupBy(_._2)
      .map { case (h, g) => h -> ((g.map(_._3).sum, g.length.toLong)) }
    val strata = coh.keys.filter(ref.contains).toSeq
    val observed = strata.map(h => coh(h)._1).sum
    val expectedMicro = strata.map { h =>
      BigInt(coh(h)._2) * ref(h)._1 * 1000000 / ref(h)._2
    }.sum
    val row = Analytics50.qSmr(spark, sfDir).collect().head
    assert(row.getLong(0) == strata.length.toLong)
    assert(row.getLong(1) == observed)
    assert(row.getLong(2) == (expectedMicro / 1000000).toLong)
    assert(row.getLong(3) == (BigInt(observed) * BigInt("1000000000000") / expectedMicro).toLong)
    // SMR should hover near 1e6 ppm for a random split
    assert(row.getLong(3) > 500000L && row.getLong(3) < 2000000L)
  }
}
