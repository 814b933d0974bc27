package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Graph, Warehouse}

/** Plan + semantics pins for the r7g warehouse-layout and BFS
  * operators.
  */
class WarehouseSpec extends AnyFunSuite with SharedSpark {

  test("partitioned sink scan prunes to the filtered event type") {
    val df = Warehouse.qPartitionedSink(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"scan must prune on the partition column:\n$plan")
    // result parity with the direct-source aggregation
    val direct = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("v"))
      .orderBy("day").collect()
    val got = df.collect()
    assert(got.length == direct.length)
    got.zip(direct).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getLong(1) == e.getLong(1) && g.getLong(2) == e.getLong(2))
    }
  }

  test("bucketed join rollup equals the plain unbucketed join") {
    val got = Warehouse.qBucketedJoin(spark, sfDir).collect()
    val plain = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
      .join(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc")),
        Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("q"),
        sum("pc").as("r"))
      .orderBy("o_orderpriority").collect()
    assert(got.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("footer stats equal the data they index, without reading data pages") {
    val r = Warehouse.qFooterStats(spark, sfDir).collect().head
    val d = Tables.lineitem(spark, sfDir)
      .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey")).collect().head
    assert(r.getLong(1) == d.getLong(0), "footer row count vs data")
    assert(r.getLong(2) == d.getLong(1) && r.getLong(3) == d.getLong(2),
      "footer min/max vs data")
    assert(r.getLong(0) >= 1, "at least one row group")
  }

  test("modularity: nation contributions sum to the reported total") {
    val rows = graft.queries.Graph.qModularity(spark, sfDir).collect()
    val total = rows.head.getDouble(4)
    assert(rows.forall(r => r.getDouble(4) == total))
    assert(math.abs(rows.map(_.getDouble(3)).sum - total) < 1e-4,
      "rounded contributions must sum to ~q_total")
    // sanity: nations trade mostly across borders in TPC-H-ish data,
    // so the partition is weakly assortative at best
    assert(total < 0.5 && total > -0.5)
  }

  test("BFS hop counts match a brute in-memory traversal") {
    val edges = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val source = edges.flatMap(e => Seq(e._1, e._2)).min
    var visited = Map(source -> 0L)
    var frontier = Set(source)
    (1 to 3).foreach { h =>
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited.keySet
      visited ++= next.map(_ -> h.toLong)
      frontier = next
    }
    val expected = visited.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = Graph.qBfsHops(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
  }
}
