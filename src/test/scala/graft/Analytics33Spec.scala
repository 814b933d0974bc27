package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics33

/** Independent in-memory referees for the r9 batch-15 queries. */
class Analytics33Spec extends AnyFunSuite with SharedSpark {

  test("loss triangle: cumulative development replay") {
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), expr("l_orderkey = o_orderkey"))
      .select(expr("year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE)) - 1"),
        expr("year(CAST(l_shipdate AS DATE)) * 12 + month(CAST(l_shipdate AS DATE)) - 1"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong - r.getInt(0), r.getLong(2)))
      .filter(t => t._2 >= 0 && t._2 <= 5)
    val cum = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    rows.foreach { case (om, lag, rc) =>
      (lag to 5L).foreach(k => cum((om, k)) += rc)
    }
    val tMax = rows.map(_._1).max
    val got = Analytics33.qLossTriangle(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    (0L to 4L).foreach { k =>
      // the cum frame has rows only at OBSERVED lags, so a month joins
      // into factor k iff cells exist at lag == k AND lag == k+1 exactly
      val mk = rows.map(_._1).distinct
        .filter(om => om + k + 1 <= tMax)
        .filter(om => rows.exists(t => t._1 == om && t._2 == k))
        .filter(om => rows.exists(t => t._1 == om && t._2 == k + 1))
      if (mk.nonEmpty) {
        val ck = mk.map(om => cum((om, k))).sum
        val ck1 = mk.map(om => cum((om, k + 1))).sum
        val (n, gck, gck1, f) = got(k)
        assert(n == mk.size.toLong)
        assert(gck == ck && gck1 == ck1)
        assert(f == BigInt(ck1) * 1000000 / ck)
        // development factors are >= 1: cumulative revenue only grows
        assert(f >= 1000000L)
      }
    }
  }

  test("fifo match: sequential allocator equals the interval join") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_linenumber"), col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)"),
        expr("CAST(round(l_quantity) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val brandOf = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    case class Agg(var pairs: Long = 0, var q: Long = 0, var ageQ: Long = 0)
    val byBrand = scala.collection.mutable.Map.empty[String, Agg]
    li.groupBy(_._1).foreach { case (pk, g) =>
      val rec = g.filter(_._2 % 2 == 1).sortBy(t => (t._4, t._3, t._2))
      val iss = g.filter(_._2 % 2 == 0).sortBy(t => (t._4, t._3, t._2))
      // classic two-pointer FIFO allocation
      var ri = 0; var ii = 0
      var rRem = if (rec.nonEmpty) rec(0)._5 else 0L
      var iRem = if (iss.nonEmpty) iss(0)._5 else 0L
      val agg = byBrand.getOrElseUpdate(brandOf(pk), Agg())
      var matched = 0L
      while (ri < rec.length && ii < iss.length) {
        val m = math.min(rRem, iRem)
        if (m > 0) {
          agg.pairs += 1; agg.q += m
          agg.ageQ += m * (iss(ii)._4 - rec(ri)._4)
          matched += m
        }
        rRem -= m; iRem -= m
        if (rRem == 0) { ri += 1; if (ri < rec.length) rRem = rec(ri)._5 }
        if (iRem == 0) { ii += 1; if (ii < iss.length) iRem = iss(ii)._5 }
      }
      // identity: matched = min of the stream totals
      assert(matched == math.min(rec.map(_._5).sum, iss.map(_._5).sum))
    }
    val got = Analytics33.qFifoMatch(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = byBrand.filter(_._2.pairs > 0)
      .map { case (b, a) => b -> ((a.pairs, a.q, a.ageQ)) }.toMap
    assert(got == expected)
  }

  test("abc/xyz: classification census replay") {
    val monthly = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), expr("l_orderkey = o_orderkey"))
      .groupBy(col("l_partkey"),
        expr("year(CAST(o_orderdate AS DATE)) * 12 + month(CAST(o_orderdate AS DATE))"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("mc"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val perPart = monthly.groupBy(_._1).map { case (pk, g) =>
      val xs = g.map(_._2)
      val n = xs.length.toLong; val s = xs.sum
      val smm = xs.map(x => BigInt(x) * x).sum
      val cv2 = if (n == 1) 0L
        else ((BigInt(n) * smm - BigInt(s) * s) * n * 1000000 /
          (BigInt(n - 1) * s * s)).toLong
      (pk, s, cv2)
    }.toSeq
    val tot = perPart.map(_._2).sum
    val sorted = perPart.sortBy(t => (-t._2, t._1))
    var cum = 0L
    val cells = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    sorted.foreach { case (_, rev, cv2) =>
      val abc = if (BigInt(cum) * 5 < BigInt(tot) * 4) "A"
        else if (BigInt(cum) * 20 < BigInt(tot) * 19) "B" else "C"
      val xyz = if (cv2 <= 250000) "X" else if (cv2 <= 1000000) "Y" else "Z"
      val (n0, r0) = cells.getOrElse((abc, xyz), (0L, 0L))
      cells((abc, xyz)) = (n0 + 1, r0 + rev)
      cum += rev
    }
    val got = Analytics33.qAbcXyz(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val expected = cells.map { case (k, (n, r)) =>
      k -> ((n, r, (BigInt(r) * 1000000 / tot).toLong))
    }.toMap
    assert(got == expected)
  }

  test("effect sizes: d/g/rank-biserial replay") {
    val bal = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0) == "BUILDING", r.getLong(1)))
    val a = bal.filter(_._1).map(_._2.toDouble); val b = bal.filter(!_._1).map(_._2.toDouble)
    val (na, nb) = (a.length, b.length)
    val (ma, mb) = (a.sum / na, b.sum / nb)
    val ss = a.map(x => (x - ma) * (x - ma)).sum + b.map(x => (x - mb) * (x - mb)).sum
    val dd = (ma - mb) / math.sqrt(ss / (na + nb - 2))
    val g = dd * (1 - 3.0 / (4 * (na + nb) - 9))
    // U with half-credit ties, doubled to stay integral
    val u2 = bal.filter(_._1).map { case (_, x) =>
      2L * b.count(_ < x) + b.count(_ == x)
    }.sum
    val rb = (BigInt(u2) - BigInt(na) * nb) * 1000000 / (BigInt(na) * nb)
    val row = Analytics33.qEffectSizes(spark, sfDir).collect().head
    assert(row.getLong(0) == na.toLong && row.getLong(1) == nb.toLong)
    assert(math.abs(row.getDouble(2) - dd) < 1e-5)
    assert(math.abs(row.getDouble(3) - g) < 1e-5)
    assert(row.getLong(4) == rb.toLong)
    // |g| < |d|: the small-sample factor shrinks toward zero
    assert(math.abs(row.getDouble(3)) <= math.abs(row.getDouble(2)) + 1e-12)
  }

  test("source cosine: dense tf replay on a source pair") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        .map(w => (r.getString(0), w)))
    val sources = toks.map(_._1).distinct.sorted
    val (s1, s2) = (sources(0), sources(1))
    def vec(s: String) = toks.filter(_._1 == s).groupBy(_._2)
      .map { case (w, g) => w -> g.length.toLong }
    val (v1, v2) = (vec(s1), vec(s2))
    // .toSeq first: Map.keys is set-backed, and mapping a Set would
    // collapse equal products
    val dot = v1.keys.toSeq.filter(v2.contains).map(w => BigInt(v1(w)) * v2(w)).sum
    val n1 = v1.values.map(c => BigInt(c) * c).sum
    val n2 = v2.values.map(c => BigInt(c) * c).sum
    val cos = dot.toDouble / (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble))
    val got = Analytics33.qSourceCosine(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == sources.length * (sources.length - 1) / 2)
    assert(math.abs(got((s1, s2)) - cos) < 1e-5)
    got.values.foreach(c => assert(c >= 0 && c <= 1.0 + 1e-12))
  }
}
