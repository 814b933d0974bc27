package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics

/** Semantic property tests for the r7b analytics batch — each query's
  * defining invariant replayed brute-force on collected sf0.001 data
  * (registry/oracle runs cover execution and cross-engine equality;
  * these pin the MEANING against an independent in-memory referee).
  */
class AnalyticsSpec extends AnyFunSuite with SharedSpark {

  test("skyline rows are exactly the non-dominated parts (brute-force referee)") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_partkey").cast("long"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def dominated(p: (String, Long, Long, Long)) = parts.exists { q =>
      q._1 == p._1 && q._2 != p._2 &&
        q._3 <= p._3 && q._4 >= p._4 && (q._3 < p._3 || q._4 > p._4)
    }
    val expected = parts.filterNot(dominated)
      .map(p => (p._1, p._2, p._3, p._4)).toSet
    val got = Analytics.qSkyline(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("containment is directional and integer-thresholded (brute-force referee)") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(t: String): Set[String] = {
      val ts = t.trim.split("\\s+")
      if (ts.length < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val shs = docs.map { case (id, t) => id -> sh(t) }.filter(_._2.nonEmpty)
    val expected = (for {
      (a, sa) <- shs.toSeq; (b, sb) <- shs.toSeq if a != b
      common = (sa & sb).size
      if common * 5 >= sa.size * 4
    } yield (a, b, sa.size.toLong, common.toLong)).toSet
    val got = Analytics.qContainment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // direction matters: at least one pair where a⊂b holds but b⊂a doesn't
    // would be invisible to a symmetric (a<b)-keyed join
    assert(got.nonEmpty)
  }

  test("attribution conserves credit: totals equal the purchase count up to integer-div remainders") {
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    val rows = Analytics.qAttribution(spark, sfDir).collect()
    val total = rows.map(_.getDouble(1)).sum
    // each attributed purchase distributes n·(1000000 div n) ≤ 10⁶ micro-
    // units, short by < n·1e-6; direct purchases contribute exactly 1.0
    assert(total <= purchases + 1e-6, s"credit $total exceeds purchases $purchases")
    assert(total > purchases * 0.999, s"credit $total lost more than div remainders")
    assert(rows.map(_.getString(0)).toSet == Set("click", "view", "direct"))
  }

  test("ngram novelty: every source ratio is in (0, 1] and the earliest doc is fully novel") {
    val rows = Analytics.qNgramNovelty(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(2)
      assert(v > 0.0 && v <= 1.0, s"${r.getString(0)} novelty $v out of range")
    }
  }
}
