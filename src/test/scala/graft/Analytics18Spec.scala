package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 tail batch 5: conservation invariants for the semi-structured
  * flatten and the multi-aggregate pivot.
  */
class Analytics18Spec extends AnyFunSuite with SharedSpark {

  test("json_flatten: explode conserves 2 items per event, totals exact") {
    val out = graft.queries.Analytics18.qJsonFlatten(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_items")).sum == 2 * nEvents,
      "flatten must yield exactly 2 line items per event")
    // planted v-sum identity: second item doubles the first, so the
    // grand total is 3x the cents sum
    val cents = Tables.events(spark, sfDir)
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))).collect()
      .head.getLong(0)
    assert(out.map(_.getAs[Long]("total_v")).sum == 3 * cents)
  }

  test("pivot_multi: cells conserve order count and revenue") {
    val out = graft.queries.Analytics18.qPivotMulti(spark, sfDir).collect()
    val o = Tables.orders(spark, sfDir)
    val total = o.count()
    val cents = o.agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .collect().head.getLong(0)
    val nSum = out.map(r => r.getAs[Long]("F_n") + r.getAs[Long]("O_n")
      + r.getAs[Long]("P_n")).sum
    val cSum = out.map(r => r.getAs[Long]("F_cents") + r.getAs[Long]("O_cents")
      + r.getAs[Long]("P_cents")).sum
    assert(nSum == total, s"pivot dropped orders: $nSum != $total")
    assert(cSum == cents, s"pivot dropped revenue: $cSum != $cents")
  }
}
