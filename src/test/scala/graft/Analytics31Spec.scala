package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics31

/** Independent in-memory referees for the r9 batch-13 queries. */
class Analytics31Spec extends AnyFunSuite with SharedSpark {

  private def dailyRev(): IndexedSeq[Long] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1)).toIndexedSeq

  test("holt linear: scalar recursion replay") {
    val ys = dailyRev().map(_.toDouble)
    var l = ys(0); var b = ys(1) - ys(0)
    ys.drop(2).foreach { y =>
      val nl = 0.3 * y + 0.7 * (l + b)
      b = 0.1 * (nl - l) + 0.9 * b
      l = nl
    }
    val row = Analytics31.qHoltLinear(spark, sfDir).collect().head
    assert(row.getLong(0) == ys.length.toLong)
    assert(math.abs(row.getDouble(1) - l) < 1e-5)
    assert(math.abs(row.getDouble(2) - b) < 1e-5)
    assert(math.abs(row.getDouble(3) - (l + 7 * b)) < 1e-5)
    // a smoothed level stays within the observed range
    assert(row.getDouble(1) >= ys.min && row.getDouble(1) <= ys.max)
  }

  test("sprt: cumulative LLR replay and boundary semantics") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").cast("string"),
        (col("event_type") === "purchase").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ctrl = ev.filter(_._1 % 2 == 0)
    val p0 = ctrl.map(_._3).sum.toDouble / ctrl.length
    val lnq = math.round(math.log((1 - 1.2 * p0) / (1 - p0)) * 1e6)
    val days = ev.filter(_._1 % 2 == 1).groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L
    val expected = days.map { case (day, g) =>
      val n = g.length.toLong; val k = g.map(_._3).sum
      cum += k * 182322L + (n - k) * lnq
      (day, n, k, cum, if (cum >= 2944439L) 1L else if (cum <= -2944439L) -1L else 0L)
    }
    val got = Analytics31.qSprt(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
  }

  test("ab power: textbook sample-size formula replay") {
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(_.getLong(0).toDouble)
    val n = vals.length
    val mean = vals.sum / n
    val v = vals.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val za = 1.959963984540054; val zb = 0.8416212335729143
    val delta = 0.02 * mean
    val nReq = math.ceil((za + zb) * (za + zb) * 2 * v / (delta * delta)).toLong
    val row = Analytics31.qAbPower(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - mean) < 1e-3)
    assert(math.abs(row.getDouble(2) - v) < math.abs(v) * 1e-9 + 1e-3)
    assert(math.abs(row.getLong(3) - nReq) <= 1)
  }

  test("ridge closed form: normal-equation solve replay, lambda shrinks") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = rows.length
    val m1 = rows.map(_._1).sum / n; val m2 = rows.map(_._2).sum / n
    val my = rows.map(_._3).sum / n
    def c(f: ((Double, Double, Double)) => Double, g: ((Double, Double, Double)) => Double,
          mf: Double, mg: Double) =
      rows.map(t => (f(t) - mf) * (g(t) - mg)).sum
    val lam = 1e6
    val a11 = c(_._1, _._1, m1, m1) + lam; val a22 = c(_._2, _._2, m2, m2) + lam
    val a12 = c(_._1, _._2, m1, m2)
    val c1 = c(_._1, _._3, m1, my); val c2 = c(_._2, _._3, m2, my)
    val det = a11 * a22 - a12 * a12
    val b1 = (c1 * a22 - c2 * a12) / det
    val b2 = (c2 * a11 - c1 * a12) / det
    val row = Analytics31.qRidgeClosed(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - b1) < math.abs(b1) * 1e-6 + 1e-5)
    assert(math.abs(row.getDouble(2) - b2) < math.abs(b2) * 1e-6 + 1e-4)
    assert(math.abs(row.getDouble(3) - (my - b1 * m1 - b2 * m2)) < 1.0)
    // ridge keeps the solution finite and bounded by the unregularized
    // OLS magnitude scale (price cents per unit quantity)
    assert(math.abs(row.getDouble(1)) < 1e7 && math.abs(row.getDouble(2)) < 1e7)
  }

  test("cochran-armitage: exact T and variance factor replay") {
    val cells = Tables.orders(spark, sfDir)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)"),
        (col("o_orderstatus") === "F").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (sc, g) => (sc, g.length.toLong, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val nn = cells.map(_._2).sum; val xx = cells.map(_._3).sum
    val sx = cells.map(t => t._1 * t._3).sum
    val sn = cells.map(t => t._1 * t._2).sum
    val sn2 = cells.map(t => t._1 * t._1 * t._2).sum
    val tNum = (BigInt(nn) * sx - BigInt(xx) * sn).toDouble
    val vFac = (BigInt(nn) * sn2 - BigInt(sn) * sn).toDouble
    val p = xx.toDouble / nn
    val z = tNum / math.sqrt(p * (1 - p) * nn.toDouble * vFac)
    val row = Analytics31.qCochranArmitage(spark, sfDir).collect().head
    assert(row.getLong(0) == nn)
    assert(math.abs(row.getDouble(1) - z) < 1e-4)
    assert(math.abs(row.getDouble(2) - z * z) < 1e-4)
  }
}
