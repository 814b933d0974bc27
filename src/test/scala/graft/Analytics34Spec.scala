package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{Analytics34, StreamingQ}

/** Independent in-memory referees for the r9 batch-16 queries. */
class Analytics34Spec extends AnyFunSuite with SharedSpark {

  private def daily(): IndexedSeq[(Long, Long)] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .select(expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT)"), col("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toIndexedSeq

  test("m4: per-bucket first/last/min/max replay") {
    val ds = daily()
    val i0 = ds.head._1; val i1 = ds.last._1
    val expected = ds.groupBy(t => math.min((t._1 - i0) * 40 / (i1 - i0 + 1), 39L))
      .map { case (b, g) =>
        val byI = g.sortBy(_._1)
        val minP = g.minBy(t => (t._2, t._1))
        val maxP = g.maxBy(t => (t._2, -t._1))
        b -> ((g.size.toLong, byI.head._2, byI.last._2, minP._2, maxP._2,
          minP._1, maxP._1))
      }
    val got = Analytics34.qM4Downsample(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == expected)
    // lossless-for-rendering invariant: min <= first,last <= max
    got.values.foreach { case (_, f, l, mn, mx, _, _) =>
      assert(mn <= f && f <= mx && mn <= l && l <= mx)
    }
  }

  test("sft pairs: split accounting and fingerprint determinism") {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.length >= 48)
    val got = Analytics34.qSftPairs(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3), r.getLong(4))))
      .toMap
    assert(got.keySet == docs.map(_._1).toSet)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.foreach { case (id, toks) =>
      val (n, pm, cm, nc) = got(id)
      assert(n == toks.length.toLong && nc == toks.length - 32L)
      assert(pm == md5(toks.take(32).mkString(" ")))
      assert(cm == md5(toks.drop(32).mkString(" ")))
    }
  }

  test("risk ratio: 2x2 replay, CI brackets the point estimate") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id") % 2 === 1, col("event_type") === "purchase")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    def cell(e: Boolean) = {
      val g = ev.filter(_._1 == e); (g.length.toLong, g.count(_._2).toLong)
    }
    val (n1, k1) = cell(true); val (n0, k0) = cell(false)
    val lnrr = math.round(math.log((k1.toDouble / n1) / (k0.toDouble / n0)) * 1e6)
    val zse = math.round(1.959963984540054 *
      math.sqrt(1.0 / k1 - 1.0 / n1 + 1.0 / k0 - 1.0 / n0) * 1e6)
    val row = Analytics34.qRiskRatio(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n1, k1, n0, k0)))
    assert(row.getLong(4) == k1 * 1000000L / n1)
    assert(row.getLong(5) == k0 * 1000000L / n0)
    assert(row.getLong(6) == lnrr)
    assert(row.getLong(7) == lnrr - zse && row.getLong(8) == lnrr + zse)
    assert(row.getLong(7) <= row.getLong(6) && row.getLong(6) <= row.getLong(8))
  }

  test("lis: patience fold equals O(n^2) DP, Erdos-Szekeres bound") {
    val ys = daily().map(_._2)
    // quadratic DP reference
    def lisDp(xs: IndexedSeq[Long], lt: (Long, Long) => Boolean): Int = {
      val dp = Array.fill(xs.length)(1)
      for (i <- xs.indices; j <- 0 until i if lt(xs(j), xs(i)))
        dp(i) = math.max(dp(i), dp(j) + 1)
      if (dp.isEmpty) 0 else dp.max
    }
    val inc = lisDp(ys, _ < _); val dec = lisDp(ys, _ > _)
    val row = Analytics34.qLis(spark, sfDir).collect().head
    assert(row.getLong(0) == ys.length.toLong)
    assert(row.getLong(1) == inc.toLong)
    assert(row.getLong(2) == dec.toLong)
    // Erdős–Szekeres: lis·lds >= n
    assert(row.getLong(1) * row.getLong(2) >= ys.length.toLong)
  }

  test("stream sliding: every event lands in exactly two windows") {
    val rows = StreamingQ.qStreamSliding(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == 2 * nEvents)
    // window starts are on the hour and strictly increasing
    val starts = rows.map(_.getString(0))
    assert(starts.toSeq == starts.sorted.toSeq)
    starts.foreach(s => assert(s.endsWith(":00:00")))
    // cent mass is also doubled
    val totalC = Tables.events(spark, sfDir)
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == 2 * totalC)
  }
}
