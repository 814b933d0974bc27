package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r7x batch: the grid-bucketed radius join's cell-coverage claim and
  * the streaming interval join's batch parity — the two correctness
  * arguments that aren't visible from the oracle alone (the oracle
  * certifies results; these pin WHY the scalable formulations are
  * exact).
  */
class Analytics11Spec extends AnyFunSuite with SharedSpark {

  test("grid-bucketed radius join equals the brute-force O(n*m) join") {
    // brute force: every (customer, supplier) pair, Chebyshev <= 250
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("cust_id"))
      .withColumn("x", pmod(col("cust_id") * 2654435761L, lit(10000L)))
      .withColumn("y", pmod(col("cust_id") * 40503L, lit(10000L)))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").cast("long").as("supp_id"))
      .withColumn("sx", pmod(col("supp_id") * 2654435761L, lit(10000L)))
      .withColumn("sy", pmod(col("supp_id") * 40503L, lit(10000L)))
    val brute = cust.crossJoin(supp)
      .filter(abs(col("x") - col("sx")) <= 250 && abs(col("y") - col("sy")) <= 250)
      .groupBy("cust_id").agg(count(lit(1)).as("n_supp"))
      .groupBy("n_supp").agg(count(lit(1)).as("n_customers"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = cust.count()
    val bruteWithZero = brute + (0L -> (total - brute.values.sum))

    val got = graft.queries.Analytics11.qGridRadiusJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.filter(_._1 > 0L) == brute.filter(_._1 > 0L),
      s"nonzero buckets differ: grid=$got brute=$brute")
    assert(got.getOrElse(0L, 0L) == math.max(0L, total - brute.values.sum),
      s"zero bucket differs: grid=$got total=$total matched=${brute.values.sum}; " +
        s"unused=$bruteWithZero")
  }

  test("streaming interval join emits exactly the batch join's rows") {
    val gotStream = graft.queries.Analytics11.qStreamJoin(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("ts").as("err_ts"), col("event_id").as("err_id"))
    val batch = clicks.join(errors,
        col("user_id") === col("eu") &&
          col("err_ts") >= col("click_ts") &&
          col("err_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("click_id"), col("err_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"))
      .collect().map(_.toSeq).toSet
    assert(gotStream == batch,
      s"stream-only=${gotStream -- batch} batch-only=${batch -- gotStream}")
  }

  test("consistent sample is a pure function of the key: rerun and append-invariance") {
    val s1 = graft.queries.Analytics11.qConsistentSample(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val s2 = graft.queries.Analytics11.qConsistentSample(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(s1 == s2, "same input must give identical sample")
    // membership is per-row: sampling a filtered subset = filtering the sample
    val docs = Tables.documents(spark, sfDir)
    val half = docs.filter(col("doc_id") % 2 === 0)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "20")
      .agg(sum("doc_id")).head().getLong(0)
    val fromFull = docs
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "20")
      .filter(col("doc_id") % 2 === 0)
      .agg(sum("doc_id")).head().getLong(0)
    assert(half == fromFull, "sample membership must commute with any other filter")
  }
}
