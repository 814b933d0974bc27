package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics19
import graft.functions.HllEstimate

/** Semantic referees for the r9 portable-sketch + experimentation batch:
  * HLL error/merge guarantees, KMV estimator sanity, bit-exact dyadic
  * EWMA replay, CDC merge last-writer-wins, and a full in-memory CUPED
  * recomputation.
  */
class Analytics19Spec extends AnyFunSuite with SharedSpark {

  test("portable HLL: within sketch error of exact, partition-invariant") {
    val rows = Analytics19.qHllPortable(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(1)
      val exact = r.getLong(2).toDouble
      // 1.04/sqrt(512) ~ 4.6% standard error; 4 sigma guard band
      assert(math.abs(est - exact) / exact < 0.20,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
    val li = Tables.lineitem(spark, sfDir).select("l_returnflag", "l_partkey")
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("l_returnflag")
      .agg(HllEstimate.hllEstimate(col("l_partkey"), 9).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(li) == run(li.repartition(7)),
      "register max-merge must be partition-invariant")
  }

  test("KMV: estimate within loose band of exact distinct") {
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("ed"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Analytics19.qKmvDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getLong(2).toDouble
      val ed = exact(r.getString(0)).toDouble
      // k=64 -> ~1/8 relative standard error; 4 sigma
      assert(math.abs(est - ed) / ed < 0.5, s"${r.getString(0)}: $est vs $ed")
    }
  }

  test("EWMA: bit-exact dyadic replay from the daily series") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("string").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val expected = daily.indices.drop(32).map { i =>
      var s = 0.0
      for (j <- 0 until 32)
        s += (if (i - j >= 0) daily(i - j)._2 else 0L).toDouble / (1L << (j + 1))
      (daily(i)._1, daily(i)._2, s)
    }
    val got = Analytics19.qEwma(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // dyadic weights + integer cents => EXACT equality, not tolerance
    assert(got.toSeq == expected.toSeq)
  }

  test("CDC merge: last-writer-wins with delete tombstones") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val expected = evs.groupBy(_._1).flatMap { case (uid, ops) =>
      val last = ops.maxBy(o => (o._2.getTime, o._3))
      if (last._4 == "error") None
      else Some(uid -> (ops.length.toLong, math.round(last._5 * 100)))
    }
    val got = Analytics19.qCdcMerge(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("CUPED: moments replay, and the pooled adjustment reduces variance") {
    val rows = Analytics19.qCuped(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // pooled variance must not increase: theta is the pooled OLS
    // minimizer of var(Y - theta X), and per-variant X is a random
    // (parity) split, so weighted-average reduction stays >= 0
    val totalN = rows.map(_.getLong(1)).sum.toDouble
    val wVar = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / totalN
    val wVarC = rows.map(r => r.getLong(1) * r.getDouble(5)).sum / totalN
    assert(wVarC <= wVar * 1.0001,
      s"pooled CUPED variance $wVarC exceeds raw $wVar")
    rows.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(5) > 0)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) <
        3 * math.sqrt(r.getDouble(4)),
        "adjusted mean drifted implausibly far from raw mean")
    }
  }
}
