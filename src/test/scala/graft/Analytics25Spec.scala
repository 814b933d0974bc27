package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics25

/** In-memory referees for the r9 closer batch. */
class Analytics25Spec extends AnyFunSuite with SharedSpark {

  test("gini impurity: decile census replay, bounds respected") {
    val perUser = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(u => (u._2, u._1))
    val n = perUser.length
    val decOf = perUser.zipWithIndex.map { case ((u, _), i) =>
      // ntile: first (n mod 10) buckets get ceil(n/10)
      val big = n % 10
      val bigSz = n / 10 + 1
      val dec = if (big > 0 && i < big * bigSz) i / bigSz
      else (i - big * bigSz) / (n / 10) + big
      u -> (dec + 1).toLong
    }.toMap
    val evs = Tables.events(spark, sfDir).select("user_id", "event_type")
      .collect().map(r => (decOf(r.getLong(0)), r.getString(1)))
    val expected = evs.groupBy(_._1).map { case (d, g) =>
      val counts = g.groupBy(_._2).values.map(_.length.toLong)
      val tot = counts.sum
      d -> (tot, counts.size.toLong,
        ((tot * tot - counts.map(c => c * c).sum) * 1000000L) / (tot * tot))
    }
    val got = Analytics25.qGiniImpurity(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    got.values.foreach(v => assert(v._3 >= 0 && v._3 < 1000000))
  }

  test("dup ratio: near-dup losers per source match the cluster census") {
    val dir = sfDir
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    import graft.dedup.Dedup
    val losers = Dedup.dupClusters(
        Dedup.jaccardPairs(Tables.documents(spark, dir), 0.6, maxDf = 16))
      .filter(col("id") =!= col("cluster_id")).select("id")
      .collect().map(_.getLong(0)).toSet
    val expected = docs.groupBy(_._2).map { case (src, g) =>
      val dups = g.count(d => losers(d._1)).toLong
      src -> (g.length.toLong, dups, dups * 1000000L / g.length)
    }
    val got = Analytics25.qDupRatio(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "fixture must contain exact dups")
  }

  test("odds ratio: 2x2 cells partition the corpus and OR is consistent") {
    val r = Analytics25.qOddsRatio(spark, sfDir).collect().head
    val (a, b, c, dd) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(a + b + c + dd == Tables.documents(spark, sfDir).count())
    assert(r.getLong(4) == a * dd * 1000000L / (b * c))
    assert(r.getLong(5) == a * 1000000L / (a + b) - c * 1000000L / (c + dd))
    // parity is independent of the gate by construction: OR near 1
    assert(r.getLong(4) > 200000 && r.getLong(4) < 5000000,
      s"implausible OR ${r.getLong(4)} ppm")
  }
}
