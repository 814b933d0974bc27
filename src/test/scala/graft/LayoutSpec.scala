package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZOrder2
import graft.operators.Layout

/** Z-order expression + layout operator: bit-level pins, codegen/SQL
  * parity, and the clustering claim itself (both keys' per-slice spans
  * shrink vs the global span). */
class LayoutSpec extends AnyFunSuite with SharedSpark {

  test("zorder2 interleaves bits: known values, scala helper parity") {
    // a=5 (101) → even bits {0,4} = 17; b=3 (11) → odd bits {1,3} = 10
    assert(ZOrder2.spread(5L) == 17L)
    assert((ZOrder2.spread(3L) << 1) == 10L)
    val r = spark.range(1)
      .select(ZOrder2.zorder2(lit(5L), lit(3L)).as("z")).head.getLong(0)
    assert(r == 27L)
    // codegen result equals the scala eval on a non-trivial sweep
    val rows = spark.range(1000)
      .select(col("id"), ZOrder2.zorder2(col("id") * 7919L, col("id") * 104729L).as("z"))
      .collect()
    rows.foreach { row =>
      val i = row.getLong(0)
      val expected = ZOrder2.spread(i * 7919L) | (ZOrder2.spread(i * 104729L) << 1)
      assert(row.getLong(1) == expected, s"id=$i")
    }
  }

  test("zorder2 is SQL-registered via GraftExtensions") {
    graft.functions.GraftExtensions.install(spark)
    val r = spark.sql("SELECT zorder2(CAST(5 AS BIGINT), CAST(3 AS BIGINT)) AS z")
      .head.getLong(0)
    assert(r == 27L)
  }

  test("z-sliced layout bounds BOTH key spans (the data-skipping claim)") {
    val rep = graft.queries.Corpus.qZorderLayout(spark, sfDir).collect()
    assert(rep.length > 8)
    val globalOk = rep.map(_.getLong(3)).max - rep.map(_.getLong(2)).min
    val globalPk = rep.map(_.getLong(5)).max - rep.map(_.getLong(4)).min
    def span(r: org.apache.spark.sql.Row, lo: Int, hi: Int) =
      (r.getLong(hi) - r.getLong(lo)).toDouble
    val avgOk = rep.map(span(_, 2, 3)).sum / rep.length
    val avgPk = rep.map(span(_, 4, 5)).sum / rep.length
    // a lexicographic sort on one key leaves the OTHER key's per-slice
    // span ≈ the global span; the Morton curve must shrink both
    assert(avgOk < 0.6 * globalOk, s"orderkey avg span $avgOk vs global $globalOk")
    assert(avgPk < 0.6 * globalPk, s"partkey avg span $avgPk vs global $globalPk")
  }

  test("zorderLayout plans a range exchange + local sort on the z value") {
    val df = Layout.zorderLayout(
      Tables.lineitem(spark, sfDir), col("l_orderkey"), col("l_partkey"), 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(2000))
    assert(plan.toLowerCase.contains("sort"), plan.take(2000))
  }
}
