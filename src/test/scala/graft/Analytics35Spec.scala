package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics35

/** Independent in-memory referees for the r9 batch-17 queries. */
class Analytics35Spec extends AnyFunSuite with SharedSpark {

  test("pettitt: O(n^2) sign-sum definition equals the rank form") {
    val ys = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .orderBy("day").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val n = ys.length
    // textbook U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
    var best = (0L, ""); var bestAbs = -1L
    var ut = 0L
    for (t <- 1 until n) {
      // incremental: U_t = U_{t-1} + sum_j sgn(x_t - x_j) over all j != t
      val xt = ys(t - 1)._2
      val s = ys.map(o => java.lang.Long.signum(xt - o._2).toLong).sum
      ut += s
      if (math.abs(ut) > bestAbs) { bestAbs = math.abs(ut); best = (ut, ys(t - 1)._1) }
    }
    val row = Analytics35.qPettitt(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getString(1) == best._2)
    assert(row.getLong(2) == best._1)
    assert(row.getLong(3) == bestAbs)
    val expArg = BigInt(bestAbs) * bestAbs * 6000000 /
      (BigInt(n) * n * n + BigInt(n) * n)
    assert(row.getLong(4) == expArg.toLong)
  }

  test("katz: degree-convolution walk counts replay") {
    val eo = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), expr("l_orderkey = o_orderkey"))
      .select(col("o_custkey") * 2, col("l_suppkey") * 2 + 1)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = eo ++ eo.map(e => (e._2, e._1))
    val adj = edges.groupBy(_._1).map { case (a, g) => a -> g.map(_._2) }
    val deg = adj.map { case (a, ns) => a -> ns.length.toLong }
    val w2 = adj.map { case (a, ns) => a -> ns.map(deg).sum }
    val w3 = adj.map { case (a, ns) => a -> ns.map(w2).sum }
    val scores = deg.keys.map(a =>
      (a, deg(a) * 50000L + w2(a) * 2500L + w3(a) * 125L)).toSeq
    val expected = scores.sortBy(t => (-t._2, t._1)).take(20)
    val got = Analytics35.qKatzCentrality(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(got.toSeq == expected)
  }

  test("unicode classes: shares sum to one million per lang") {
    val rows = Analytics35.qUnicodeClasses(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = (2 to 6).map(r.getLong)
      // five floor-divs each lose < 1 ppm-unit
      assert(parts.sum <= 1000000L && parts.sum > 1000000L - 5)
    }
    // replay one lang from raw text
    val (lang, txts) = {
      val all = Tables.documents(spark, sfDir).select("lang", "text").collect()
        .map(r => (r.getString(0), r.getString(1)))
      (all.head._1, all.filter(_._1 == all.head._1).map(_._2))
    }
    val n = txts.map(_.length.toLong).sum
    val lo = txts.map(_.count(c => c >= 'a' && c <= 'z').toLong).sum
    val row = rows.find(_.getString(0) == lang).get
    assert(row.getLong(1) == n)
    assert(row.getLong(2) == lo * 1000000L / n)
  }

  test("roc curve: monotone, anchored replay at one threshold") {
    val rows = Analytics35.qRocCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 19)
    // thresholds descend with step; TPR and FPR are non-decreasing in step
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2); assert(a._3 <= b._3); assert(a._4 <= b._4)
    }
    // replay one point from raw data
    val cnts = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(1), if (cnts.getOrElse(r.getLong(0), 0L) >= 8) 1L else 0L))
    val p = scored.count(_._2 == 1L).toLong; val nn = scored.length - p
    val (_, thr, tpr, fpr) = rows.head
    assert(tpr == scored.count(t => t._1 >= thr && t._2 == 1L) * 1000000L / p)
    assert(fpr == scored.count(t => t._1 >= thr && t._2 == 0L) * 1000000L / nn)
  }

  test("perm test: md5 relabeling replay") {
    val base = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bs = base.filter(_._2 == "BUILDING").map(_._3)
    val ms = base.filter(_._2 == "MACHINERY").map(_._3)
    val obs = math.abs(bs.sum.toDouble / bs.length - ms.sum.toDouble / ms.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    def gp(b: Long, ck: Long): Int = {
      val h = md.digest(s"${b}_$ck".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(0, 1), 16) % 2
    }
    val gaps = (1L to 64L).map { b =>
      val g1 = base.filter(t => gp(b, t._1) == 1).map(_._3)
      val g0 = base.filter(t => gp(b, t._1) == 0).map(_._3)
      math.abs(g1.sum.toDouble / g1.length - g0.sum.toDouble / g0.length)
    }
    val nGe = gaps.count(_ >= obs).toLong
    val row = Analytics35.qPermTest(spark, sfDir).collect().head
    assert(row.getLong(0) == 64L)
    assert(row.getLong(1) == nGe)
    assert(math.abs(row.getDouble(2) - obs) < 1e-3)
    assert(row.getLong(3) == nGe * 1000000L / 64L)
  }
}
