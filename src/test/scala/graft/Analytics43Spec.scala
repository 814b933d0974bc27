package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics43

/** Independent in-memory referees for the r9 batch-25 queries. */
class Analytics43Spec extends AnyFunSuite with SharedSpark {

  test("holt-winters: scalar recursion replay with rolling seasonal state") {
    val ys = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1).toDouble).toIndexedSeq
    val l0 = ys.take(7).sum / 7
    val b0 = (ys.slice(7, 14).sum / 7 - ys.take(7).sum / 7) / 7
    val sarr = ys.take(7).map(_ - l0).toArray
    var l = l0; var b = b0
    (8 to ys.length).foreach { t =>
      val y = ys(t - 1)
      val slot = (t - 8) % 7
      val lNew = 0.3 * (y - sarr(slot)) + 0.7 * (l + b)
      b = 0.05 * (lNew - l) + 0.95 * b
      sarr(slot) = 0.2 * (y - lNew) + 0.8 * sarr(slot)
      l = lNew
    }
    val fc = l + b + sarr((ys.length - 7) % 7)
    val row = Analytics43.qHoltWinters(spark, sfDir).collect().head
    assert(row.getLong(0) == ys.length.toLong)
    assert(math.abs(row.getDouble(1) - l) < 1e-4)
    assert(math.abs(row.getDouble(2) - b) < 1e-4)
    assert(math.abs(row.getDouble(3) - fc) < 1e-4)
    // the smoothed level stays within the observed range
    assert(row.getDouble(1) >= ys.min && row.getDouble(1) <= ys.max)
  }

  test("lang distance: JS symmetry bounds and replay for one pair") {
    val rows = Analytics43.qLangDistance(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 10)  // C(5,2)
    // JS divergence is bounded by ln 2 micro-nats
    rows.foreach(t => assert(t._3 >= 0 && t._3 <= 693148))
    // replay one pair from raw text
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase))
      .filter(_._2.length >= 3)
    def profile(lang: String): Map[String, Long] =
      docs.filter(_._1 == lang)
        .flatMap(d => (0 to d._2.length - 3).map(i => d._2.substring(i, i + 3)))
        .groupBy(identity).map { case (tr, g) => tr -> g.length.toLong }
    val (la, lb) = (rows.head._1, rows.head._2)
    val (pa, pb) = (profile(la), profile(lb))
    val (na, nb) = (pa.values.sum, pb.values.sum)
    val keys = pa.keySet ++ pb.keySet
    val js = keys.toSeq.map { tr =>
      // mirror the query's op order exactly (2·p/(p1+p2), not p/m)
      val p1 = pa.getOrElse(tr, 0L).toDouble / na
      val p2 = pb.getOrElse(tr, 0L).toDouble / nb
      val tA = if (p1 > 0) math.round(p1 * math.log(2.0 * p1 / (p1 + p2)) * 1e6) else 0L
      val tB = if (p2 > 0) math.round(p2 * math.log(2.0 * p2 / (p1 + p2)) * 1e6) else 0L
      tA + tB
    }.sum / 2
    assert(rows.head._3 == js)
  }
}
