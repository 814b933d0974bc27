package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics45

/** Independent in-memory referees for the r9 batch-27 queries. */
class Analytics45Spec extends AnyFunSuite with SharedSpark {

  test("ema crossover: dual recursion + sign-change counters replay") {
    val ys = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1).toDouble).toIndexedSeq
    var f = ys(0); var s = ys(0); var sgn = 0; var up = 0L; var down = 0L
    ys.drop(1).foreach { y =>
      val f2 = 0.25 * y + 0.75 * f
      val s2 = 0.0689655172413793 * y + 0.9310344827586207 * s
      if (sgn == -1 && f2 > s2) up += 1
      if (sgn == 1 && f2 < s2) down += 1
      sgn = if (f2 > s2) 1 else if (f2 < s2) -1 else sgn
      f = f2; s = s2
    }
    val row = Analytics45.qEmaCrossover(spark, sfDir).collect().head
    assert(row.getLong(0) == ys.length.toLong)
    assert(math.abs(row.getDouble(1) - f) < 1e-5)
    assert(math.abs(row.getDouble(2) - s) < 1e-5)
    assert(row.getLong(3) == up && row.getLong(4) == down)
    assert(row.getLong(5) == sgn.toLong)
    // crossings alternate: counts differ by at most one
    assert(math.abs(row.getLong(3) - row.getLong(4)) <= 1)
  }

  test("knee point: integer cross-product argmax replay") {
    val revs = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1))
    val kk = revs.length.toLong
    val total = revs.map(_._2).sum
    var cum = 0L; var best = (0L, BigInt(-1), 0L)
    revs.zipWithIndex.foreach { case ((_, rev), i) =>
      cum += rev
      val k = i + 1L
      val cross = (BigInt(k) * total - BigInt(kk) * cum).abs
      if (cross > best._2) best = (k, cross, cum)
    }
    val row = Analytics45.qKneePoint(spark, sfDir).collect().head
    assert(row.getLong(0) == best._1)
    assert(row.getLong(1) == kk)
    assert(row.getLong(2) == best._3 * 1000000L / total)
    assert(row.getLong(3) == best._1 * 1000000L / kk)
    // the knee sits strictly inside the curve and above the diagonal
    assert(row.getLong(0) > 0 && row.getLong(0) < kk)
    assert(row.getLong(2) > row.getLong(3))
  }

  test("term burstiness: cf/df census replay") {
    val td = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        .map(w => (r.getLong(0), w)))
    val stats = td.groupBy(_._2).map { case (w, g) =>
      (w, g.length.toLong, g.map(_._1).distinct.length.toLong)
    }.filter(_._3 >= 5)
    val expected = stats.map(t => (t._1, t._2, t._3, t._2 * 1000000L / t._3))
      .toSeq.sortBy(t => (-t._4, t._1)).take(20)
    val got = Analytics45.qTermBurstiness(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // burstiness is at least one million (cf >= df by construction)
    got.foreach(t => assert(t._4 >= 1000000L))
  }
}
