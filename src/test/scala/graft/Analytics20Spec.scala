package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics20

/** In-memory referees for the r9 batch-2 operators — each test
  * recomputes the defining statistic from raw collected rows with an
  * independent (naive) algorithm.
  */
class Analytics20Spec extends AnyFunSuite with SharedSpark {

  private lazy val daily: Array[(String, Long, Long)] =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("string").as("day"))
      .agg(count(lit(1)).as("c"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("Mann-Kendall: S and var18 match the naive pair scan") {
    val c = daily.map(_._2)
    var sStat = 0L
    for (i <- c.indices; j <- i + 1 until c.length)
      sStat += java.lang.Long.signum(c(j) - c(i))
    val n = c.length.toLong
    val tieCorr = c.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val r = Analytics20.qMannKendall(spark, sfDir).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == sStat, s"S ${r.getLong(1)} vs $sStat")
    assert(r.getLong(2) == n * (n - 1) * (2 * n + 5) - tieCorr)
    val z = (sStat - java.lang.Long.signum(sStat)) /
      math.sqrt((n * (n - 1) * (2 * n + 5) - tieCorr) / 18.0)
    assert(math.abs(r.getDouble(3) - z) < 1e-6)
  }

  test("Theil-Sen: the reported slope is the exact lower-median pair slope") {
    val withI = daily.map { case (day, _, rev) =>
      (java.time.LocalDate.parse(day.take(10)).toEpochDay -
        java.time.LocalDate.parse("1992-01-01").toEpochDay, rev)
    }
    val slopes = (for {
      i <- withI.indices; j <- i + 1 until withI.length
    } yield (withI(j)._2 - withI(i)._2).toDouble /
        (withI(j)._1 - withI(i)._1)).sorted
    val r = Analytics20.qTheilSen(spark, sfDir).collect().head
    assert(r.getLong(0) == slopes.length.toLong)
    assert(r.getDouble(1) == slopes((slopes.length + 1) / 2 - 1),
      s"median ${r.getDouble(1)} vs ${slopes((slopes.length + 1) / 2 - 1)}")
  }

  test("skew/kurtosis: match naive central-moment computation") {
    val qs = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = Analytics20.qSkewKurtosis(spark, sfDir).collect()
    rows.foreach { r =>
      val xs = qs.filter(_._1 == r.getString(0)).map(_._2.toDouble)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      assert(r.getLong(1) == xs.length.toLong)
      assert(math.abs(r.getDouble(2) - m3 / math.pow(m2, 1.5)) < 1e-6,
        s"skew ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(3) - (m4 / (m2 * m2) - 3.0)) < 1e-6,
        s"kurt ${r.getDouble(3)}")
    }
  }

  test("link prediction: RA index matches the naive shared-order sum") {
    val items = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val ra = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    byOrder.values.foreach { ps =>
      val deg = ps.length.toLong
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        val key = (ps(i), ps(j))
        val (c, s) = ra.getOrElse(key, (0L, 0L))
        ra(key) = (c + 1, s + 1000000L / deg)
      }
    }
    val expected = ra.filter(_._2._1 >= 2)
    val got = Analytics20.qLinkPredict(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
    got.foreach { case (k, v) =>
      assert(expected(k) == v, s"pair $k: $v vs ${expected(k)}")
    }
    assert(got.nonEmpty)
    // top-100 really is the max-RA prefix
    val minGot = got.map(_._2._2).min
    assert(expected.values.count(_._2 > minGot) <= got.length)
  }

  test("seq match: journeys and the browse-to-buy flag replay") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3).substring(0, 1)))
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val j = es.sortBy(e => (e._2, e._3)).map(_._4).mkString
      u -> (es.length.toLong, j, if ("v[vc]*p".r.findFirstIn(j).isDefined) 1L else 0L)
    }
    val got = Analytics20.qSeqMatch(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    assert(got.values.exists(_._3 == 1L), "fixture must contain a v->p journey")
  }

  test("id gaps: census matches the naive sorted scan") {
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey").collect().map(_.getLong(0)).distinct.sorted
    val gaps = keys.sliding(2).collect {
      case Array(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toArray
    val rows = Analytics20.qIdGaps(spark, sfDir).collect()
    assert(rows.nonEmpty, "urgent-order key stream must contain holes")
    val head = rows.head
    assert(head.getLong(4) == gaps.length.toLong)
    assert(head.getLong(5) == gaps.map(_._3).sum)
    assert(head.getLong(6) == gaps.map(_._3).max)
    val expTop = gaps.sortBy(g => (-g._3, g._1)).take(10).toSeq
    assert(rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == expTop)
  }

  test("BM25: scores replay and ranking is the score-desc prefix") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) => (id, t.trim.split("\\s+")) }
    val n = toks.length.toDouble
    val sumDl = toks.map(_._2.length.toLong).sum
    def score(tk: Array[String]): Double = {
      val dl = tk.length.toLong
      def term(t: String): Double = {
        val df = toks.count(_._2.contains(t)).toDouble
        val idf = BigDecimal(math.log((n - df + 0.5) / (df + 0.5)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val tf = tk.count(_ == t).toDouble
        if (tf == 0) 0.0
        else idf * (tf * 2.2 /
          (tf + 1.2 * (0.25 + 0.75 * (dl * n / sumDl))))
      }
      term("data") + term("row")
    }
    val got = Analytics20.qBm25(spark, sfDir).collect()
    assert(got.length == 20)
    val byId = toks.toMap
    got.foreach { r =>
      val exp = BigDecimal(score(byId(r.getLong(0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - exp) < 2e-6,
        s"doc ${r.getLong(0)}: ${r.getDouble(4)} vs $exp")
    }
    // descending by rounded score
    val scores = got.map(_.getDouble(4)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
