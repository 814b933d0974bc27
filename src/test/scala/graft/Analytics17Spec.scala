package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 tail batch 4: exactness invariants for apportionment, budget
  * fill, the runs test, and the forecast backtest.
  */
class Analytics17Spec extends AnyFunSuite with SharedSpark {

  test("quota_mix: allocations sum to exactly K and differ from base by <= 1") {
    val out = graft.queries.Analytics17.qQuotaMix(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("alloc")).sum == 1000L,
      "largest-remainder apportionment must hit the quota exactly")
    out.foreach { r =>
      val d = r.getAs[Long]("alloc") - r.getAs[Long]("base")
      assert(d == 0L || d == 1L, s"top-up must be 0 or 1: $r")
    }
  }

  test("token_budget: admitted set is maximal under the greedy order") {
    val out = graft.queries.Analytics17.qTokenBudget(spark, sfDir).collect()
    val cumMax = out.map(_.getAs[Long]("cum_at_last")).max
    assert(cumMax <= 100000L, "budget exceeded")
    // the first excluded doc in greedy order would overflow the budget
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("n_tok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val firstExcluded = docs.withColumn("cum_tok", sum("n_tok").over(w))
      .filter(col("cum_tok") > 100000L)
      .orderBy("cum_tok").limit(1).collect()
    firstExcluded.foreach { r =>
      assert(r.getAs[Long]("cum_tok") > 100000L)
      assert(r.getAs[Long]("cum_tok") - r.getAs[Long]("n_tok") <= 100000L,
        "a doc was excluded although it would have fit in greedy order")
    }
  }

  test("runs_test: run count bounded by sign counts, z finite") {
    val r = graft.queries.Analytics17.qRunsTest(spark, sfDir).collect().head
    val (runs, a, b) = (r.getAs[Long]("n_runs"), r.getAs[Long]("n_above"),
      r.getAs[Long]("n_below"))
    assert(runs >= 1L && runs <= a + b)
    assert(runs <= 2L * math.min(a, b) + 1L, "more runs than alternation allows")
    assert(!r.getAs[Double]("z").isNaN && !r.getAs[Double]("z").isInfinite)
  }

  test("seasonal_naive: scores every day with a 7-back lag, MAE exact") {
    val r = graft.queries.Analytics17.qSeasonalNaive(spark, sfDir)
      .collect().head
    val totalDays = Tables.orders(spark, sfDir)
      .select("o_orderdate").distinct().count()
    assert(r.getAs[Long]("n_days") == totalDays - 7)
    assert(r.getAs[Long]("mae_c") >= 0L)
    assert(r.getAs[Long]("sum_abs_err_c") / r.getAs[Long]("n_days")
      == r.getAs[Long]("mae_c"))
  }
}
