package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics23

/** In-memory referees for the r9 batch-5 operators. */
class Analytics23Spec extends AnyFunSuite with SharedSpark {

  test("label propagation: three synchronous rounds replay") {
    val items = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // DISTINCT neighbor sets — the query's edge list is deduplicated,
    // so a neighbor sharing several orders still votes once
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    items.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).toSet
      ps.foreach(p => adj(p) = adj(p) ++ (ps - p))
    }
    var labels = adj.keys.map(p => p -> p).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (v, ns) =>
        val counts = ns.toSeq.map(labels).groupBy(identity)
          .toSeq.map { case (l, g) => (g.size, l) }
        // (cnt DESC, lbl ASC)
        v -> counts.sortBy(c => (-c._1, c._2)).head._2
      }.toMap
    }
    val expected = labels.groupBy(_._2).view
      .mapValues(m => (m.size.toLong, m.keys.sum)).toMap
      .filter(_._2._1 >= 3)
      .toSeq.sortBy(kv => (-kv._2._1, kv._1)).take(50).toMap
    val got = Analytics23.qLabelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("daily bands: rank-selected p50/p95 on sampled days") {
    val rows = Analytics23.qDailyBands(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sample = rows.take(5) ++ rows.takeRight(5)
    sample.foreach { r =>
      val vs = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate").cast("date").cast("string") === r.getString(0))
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .collect().map(_.getLong(0)).sorted
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getLong(2) == vs(math.max(vs.length * 50 / 100, 1) - 1),
        s"${r.getString(0)} p50")
      assert(r.getLong(3) == vs(math.max(vs.length * 95 / 100, 1) - 1),
        s"${r.getString(0)} p95")
    }
  }

  test("cluster survivorship: canonical is the longest (then lowest-id) member") {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sfDir)
    val clusters = Dedup.dupClusters(
        Dedup.jaccardPairs(docs, 0.6, maxDf = 16)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = clusters.groupBy(_._2)
      .filter(_._2.length >= 2)
      .map { case (cid, members) =>
        val ids = members.map(_._1)
        val canon = ids.map(id => (chars(id), -id)).max
        cid -> (ids.length.toLong, -canon._2, canon._1, ids.sum)
      }
    val got = Analytics23.qClusterCanon(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture must contain multi-doc clusters")
  }

  test("path rollup: census equals the naive prefix count") {
    val ids = Tables.events(spark, sfDir).select("event_id").collect()
      .map(_.getLong(0))
    val expected = ids.flatMap { e =>
      val (a, b, c) = (s"/p${e % 5}", s"/s${e % 3}", s"/f${e % 2}")
      Seq((1L, a), (2L, a + b), (3L, a + b + c))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Analytics23.qPathRollup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }
}
