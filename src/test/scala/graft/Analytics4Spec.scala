package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics4

/** Semantic property tests for the r7e batch — in-memory referees for
  * RRF fusion, time-weighted averages, the mergeSchema generation read,
  * and the MMR greedy.
  */
class Analytics4Spec extends AnyFunSuite with SharedSpark {

  test("RRF: fused score is exactly the reciprocal-rank sum of both rankings") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+")))
    val scored = docs.map { case (id, ts) =>
      (id, ts.count(_ == "scan").toLong,
        ts.count(_ == "join").toLong * 1000L / ts.length) }
    def rankOf(key: ((Long, Long, Long)) => Long): Map[Long, Long] =
      scored.sortBy(r => (-key(r), r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val ra = rankOf(_._2); val rb = rankOf(_._3)
    val expected = scored.map { case (id, _, _) =>
      id -> (60000L / (60 + ra(id)) + 60000L / (60 + rb(id))) }.toMap
    val got = Analytics4.qRrfFusion(spark, sfDir).collect()
    assert(got.length == 20)
    got.foreach { r =>
      assert(r.getLong(5) == expected(r.getLong(0)), s"rrf at doc ${r.getLong(0)}")
    }
    // top-20 really is the global top by (score desc, id)
    val top = expected.toSeq.sortBy { case (id, s) => (-s, id) }.take(20).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == top)
  }

  test("time-weighted average matches an in-memory hold-until-next integral") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val s = rows.sortBy(r => (r._3, r._2))
      val gaps = s.zip(s.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      val span = gaps.map(_._2).sum
      val twa = if (gaps.isEmpty) None else Some(gaps.map(g => g._1 * g._2).sum / span)
      u -> ((rows.length.toLong, twa, if (gaps.isEmpty) None else Some(span)))
    }
    val got = Analytics4.qTimeWeightedAvg(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    assert(got == expected)
  }

  test("mergeSchema read: old-generation rows surface with null drifted column") {
    val rows = Analytics4.qSchemaEvolution(spark, sfDir).collect()
    assert(rows.length == 2)
    val byGen = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val o = Tables.orders(spark, sfDir).select("o_orderkey").collect().map(_.getLong(0))
    val even = o.filter(_ % 2 == 0); val odd = o.filter(_ % 2 == 1)
    assert(byGen(0L) == ((even.length.toLong, 0L, even.sum)),
      "gen0 must read back complete with all-null price_c")
    assert(byGen(1L) == ((odd.length.toLong, odd.length.toLong, odd.sum)),
      "gen1 must read back with its price column intact")
  }

  test("MMR: picks maximize lambda*rel - (1-lambda)*max-sim greedily and are distinct") {
    val rows = Analytics4.qMmrDiversify(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).distinct.length == 10, "picks must be distinct")
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "ranks must be 1..10")
    // rank 1 is the pure-relevance argmax (no diversity penalty yet)
    val rels = rows.map(_.getDouble(2))
    assert(rows.head.getDouble(3) == BigDecimal(0.7 * rels.head)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // deterministic across runs
    val again = Analytics4.qMmrDiversify(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // diversification is real: MMR order differs from pure relevance order
    // OR every pick is maximally spread — check the mmr scores are non-increasing
    val mmrs = rows.map(_.getDouble(3))
    assert(mmrs.zip(mmrs.tail).forall(p => p._1 >= p._2 - 1e-9),
      "greedy MMR scores must be non-increasing")
  }
}
