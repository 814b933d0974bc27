package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Monitor, Scale}

/** In-flight metrics (`observe`) and dynamic partition pruning — the two
  * "don't scan twice" production levers: quality gates ride the action the
  * caller was already running, and a selective dim filter prunes fact
  * partitions at runtime instead of after a full scan. */
class MonitorSpec extends AnyFunSuite with SharedSpark {

  test("observed metrics match a direct aggregate, from one action") {
    val o = Tables.orders(spark, sfDir)
    val (instrumented, obs) = Monitor.observed(o, "orders_gate", Seq(
      count(lit(1)).as("n"),
      sum(when(col("o_orderpriority").isNull, 1).otherwise(0)).as("null_prio"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price")))
    // the caller's OWN action — the metrics piggyback on this scan
    val written = instrumented.count()
    val m = obs.get
    assert(m("n") == written)
    val direct = o.agg(
      count(lit(1)), sum(when(col("o_orderpriority").isNull, 1).otherwise(0)),
      min(col("o_totalprice")), max(col("o_totalprice"))).head
    assert(m("n") == direct.getLong(0))
    assert(m("null_prio") == direct.getLong(1))
    assert(m("min_price") == direct.getDouble(2))
    assert(m("max_price") == direct.getDouble(3))
  }

  test("observation gates a pipeline stage without re-reading the input") {
    // the production shape: write the stage output, then assert bounds
    // from the SAME job before promoting it
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val (instrumented, obs) = Monitor.observed(li, "stage_gate", Seq(
      count(lit(1)).as("rows"),
      sum(when(col("l_quantity") <= 0, 1).otherwise(0)).as("bad_qty")))
    val dir = java.nio.file.Files.createTempDirectory("graft_observe").toString
    instrumented.write.mode("overwrite").parquet(dir + "/out")
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] > 0)
    assert(m("bad_qty") == 0L, "quality gate would block promotion")
    // the written output is complete — the observe operator is a pass-through
    assert(spark.read.parquet(dir + "/out").count() == m("rows"))
  }

  test("join against a filtered dim dynamically prunes fact partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    Scale.writePartitioned(li, "l_returnflag", dir + "/fact")
    val fact = spark.read.parquet(dir + "/fact")
    // DPP requires a SELECTIVE predicate on the dim side of the join —
    // an unfiltered local relation never triggers it
    spark.createDataFrame(Seq(("R", "returned"), ("A", "accepted"),
      ("N", "none"))).toDF("flag", "label")
      .write.mode("overwrite").parquet(dir + "/dim")
    val dim = spark.read.parquet(dir + "/dim")
      .filter(col("label") === "returned")
    val joined = fact.join(broadcast(dim), fact("l_returnflag") === dim("flag"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "fact scan not dynamically pruned:\n" + plan)
    // pruned result still correct
    val expected = li.filter(col("l_returnflag") === "R").count()
    assert(joined.count() == expected)
  }
}
