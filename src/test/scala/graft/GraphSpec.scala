package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-memory referee for the k-core peel (q_kcore): replay the parallel
  * peeling on the collected trading graph and check both the 5-round
  * profile the query reports and the converged-core membership the
  * fixed-round query intentionally truncates.
  */
class GraphSpec extends AnyFunSuite with SharedSpark {

  private def collectEdges(): Set[(Long, Long)] =
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet

  /** One parallel peel round: drop every node whose degree < k. Returns
    * (number removed, remaining edges). */
  private def peel(edges: Set[(Long, Long)], k: Int): (Int, Set[(Long, Long)]) = {
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
    val low = deg.collect { case (n, c) if c < k => n }.toSet
    (low.size, edges.filter { case (a, b) => !low(a) && !low(b) })
  }

  test("q_kcore: 5-round profile matches the in-memory parallel peel") {
    var e = collectEdges()
    val expected = (1 to 5).map { r =>
      val (nRemoved, rest) = peel(e, 3)
      e = rest
      (r.toLong, nRemoved.toLong, e.map(_._1).size.toLong, e.size.toLong)
    }
    val got = queries.Graph.qKcorePeel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("k-core peel converges: peeling to fixpoint leaves only degree>=3 nodes") {
    var e = collectEdges()
    var removed = -1
    while (removed != 0) { val (n, rest) = peel(e, 3); removed = n; e = rest }
    val deg = e.groupBy(_._1).map { case (_, es) => es.size }
    assert(e.isEmpty || deg.min >= 3, s"non-core node survived: min degree ${deg.min}")
  }
}
