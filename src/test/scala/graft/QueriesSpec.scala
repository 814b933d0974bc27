package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level invariants over the full query registry at sf0.001: every
  * query runs, returns rows, and has stable column names (the
  * driver-contract essentials). Value-level correctness is the DuckDB
  * oracle's job (tools/oracle_check.py). */
class QueriesSpec extends AnyFunSuite with SharedSpark {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("typed TypedColumn aggregation equals the udaf fast path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val typed = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").as("v"), col("l_extendedprice").as("w"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.WeightedMean.toColumn.name("wmean"))
      .toDF("flag", "wmean")
      .select(col("flag"), round(col("wmean"), 4).as("wmean"))
      .orderBy("flag").collect()
    val untyped = graft.queries.Relational4.qWeightedMean(spark, sfDir).collect()
    assert(typed.sameElements(untyped))
  }

  test("hll union of per-group sketches equals one global sketch, tracks exact") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val merged = graft.queries.Relational2.qHllUnion(spark, sfDir)
      .head().getLong(0)
    // merge-correctness: unioning per-group sketches must give the SAME
    // estimate as sketching the whole column in one pass (the property
    // that makes rollup-from-sketches valid)
    val global = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))))
      .head().getLong(0)
    assert(merged == global, s"merged $merged != global $global")
    val exact = li.select("l_partkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged vs exact $exact")
  }

  test("sort-based groupedQuantiles equals Spark's exact percentile aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // edge cases the lineitem oracle can't exercise: a 1-row group
    // (h integral at the last rank), nulls (ignored), an even-count
    // group (true interpolation between two values)
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", Some(10.0)),
      ("b", Some(5.0)),
      ("c", Some(4.0)), ("c", None), ("c", Some(8.0)), ("c", Some(6.0))
    ).toDF("g", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      val sorted = graft.operators.Percentiles
        .groupedQuantiles(df, "g", "v", Seq(p -> "q"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
      val builtin = df.groupBy("g")
        .agg(percentile(col("v"), lit(p)).as("q"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(sorted.sameElements(builtin), s"p=$p: ${sorted.toSeq} vs ${builtin.toSeq}")
    }
  }

  /** Queries whose result is legitimately empty at tiny scale factors
    * (no exact-duplicate texts are planted below sf0.1). */
  private val mayBeEmpty = Set("q_dedup_exact")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(df.count() > 0, s"$name returned 0 rows")
      else df.count() // still must execute
    }
  }
}
