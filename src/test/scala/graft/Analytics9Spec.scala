package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics9

/** Semantic referees for the r7p batch — in-memory phrase scanning,
  * HITS iteration, and trailing-window burst replay.
  */
class Analytics9Spec extends AnyFunSuite with SharedSpark {

  test("phrase search: positional-join hits equal the in-memory sliding scan") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val t = text.trim.split("\\s+")
      val pos = (0 until t.length - 1).filter(i => t(i) == "table" && t(i + 1) == "value")
      if (pos.nonEmpty) Some(id -> ((pos.length.toLong, pos.head))) else None
    }.toMap
    val got = Analytics9.qPhraseSearch(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == expect)
  }

  test("HITS: two-round integer scores match the in-memory iteration") {
    val ordersDf = Tables.orders(spark, sfDir)
    val liDf = Tables.lineitem(spark, sfDir)
    val edges = ordersDf
      .join(liDf, ordersDf("o_orderkey") === liDf("l_orderkey"))
      .select("o_custkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val h1 = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val a1 = edges.groupBy(_._2).view.mapValues(_.map(e => h1(e._1)).sum).toMap
    val h2 = edges.groupBy(_._1).view.mapValues(_.map(e => a1(e._2)).sum).toMap
    val a2 = edges.groupBy(_._2).view.mapValues(_.map(e => h2(e._1)).sum).toMap
    val expectTop = a2.toSeq.sortBy { case (p, s) => (-s, p) }.take(20)
    val got = Analytics9.qHits(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => (g._1, g._3)).toSeq == expectTop)
    got.foreach { case (p, ga1, _) => assert(ga1 == a1(p), s"a1 of part $p") }
  }

  test("burst detect: every flagged hour beats 3x its full 24h trailing mean") {
    val rows = Analytics9.qBurstDetect(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (_, _, cnt, trail) =>
      assert(cnt * 24 > trail * 3, s"cnt=$cnt trail=$trail")
    }
    // referee one event type fully: recompute the dense hourly series
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "date_trunc('hour', ts) AS hour")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val types = ev.map(_._1).distinct
    val hours = ev.map(_._2).distinct.sorted
    val flagged = rows.map(r => (r._1, r._2)).toSet
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    types.take(2).foreach { t =>
      val byHour = ev.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val series = hours.map(h => h -> byHour.getOrElse(h, 0L))
      series.indices.foreach { i =>
        if (i >= 24) {
          val trail = (i - 24 until i).map(j => series(j)._2).sum
          val isBurst = series(i)._2 * 24 > trail * 3
          val key = (t, fmt.format(new java.util.Date(series(i)._1)))
          assert(flagged.contains(key) == isBurst, s"$key burst=$isBurst")
        }
      }
    }
  }
}
