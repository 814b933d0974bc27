package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 tail batch 2: the datum/integer invariants behind the OLAP-window
  * completion, plus the one physical-plan claim (WindowGroupLimit) that
  * is the whole point of the grouped top-k formulation.
  */
class Analytics15Spec extends AnyFunSuite with SharedSpark {

  test("percentile_disc: every reported value is an actual datum and " +
      "quartiles are ordered") {
    val out = graft.queries.Analytics15.qPercentileDisc(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25_price"),
        r.getAs[Double]("p50_price"), r.getAs[Double]("p75_price"))
      assert(p25 <= p50 && p50 <= p75, s"quartiles unordered: $r")
    }
    // datum property: each pick exists verbatim in the source column
    val source = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("v")).distinct()
    val picks = out.selectExpr("stack(3, p25_price, p50_price, p75_price) AS v")
    assert(picks.join(source, "v").count() == picks.count(),
      "a discrete percentile is not a source datum")
  }

  test("ratio_to_report: region shares sum to 1e6 minus floor slack") {
    val out = graft.queries.Analytics15.qRatioToReport(spark, sfDir)
    val sums = out.groupBy("r_name")
      .agg(sum("share_ppm").as("s"), count(lit(1)).as("k")).collect()
    sums.foreach { r =>
      val (s, k) = (r.getAs[Long]("s"), r.getAs[Long]("k"))
      assert(s <= 1000000L && s > 1000000L - k,
        s"shares for ${r.getString(0)} sum to $s over $k nations")
    }
  }

  test("ecdf: monotone in the probe and exact against a direct count") {
    val out = graft.queries.Analytics15.qEcdf(spark, sfDir).collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    out.foreach { case (_, rows) =>
      val byProbe = rows.sortBy(_.getAs[Int]("probe")).map(_.getAs[Long]("n_le"))
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        "ECDF not monotone")
    }
    val direct = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") <= 30).count()
    val reported = out("R").find(_.getAs[Int]("probe") == 30).get.getAs[Long]("n_le")
    assert(reported == direct, s"probe-30 count $reported != direct $direct")
  }

  test("group_topk: plans as WindowGroupLimit and returns 3 rows per group") {
    val df = graft.queries.Analytics15.qGroupTopk(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank-limit pushdown missing:\n" + plan)
    val counts = df.groupBy("priority").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getAs[Long]("count") == 3L))
  }
}
