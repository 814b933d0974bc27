package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoins

/** The custom physical as-of join ([[graft.plans.AsOfJoinExec]]) vs the
  * composed union+window form — same semantics, different machinery —
  * plus plan-shape and edge-case pins. */
class AsOfJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def purchases = Tables.events(spark, sfDir)
    .filter(col("event_type") === "purchase")
    .select("user_id", "ts", "event_id", "value")
  private def signups = Tables.events(spark, sfDir)
    .filter(col("event_type") === "signup")
    .select("user_id", "ts", "event_id")

  test("native as-of equals the composed union+window as-of on real events") {
    val native = TemporalJoins.asOfNative(purchases, signups, "user_id", "ts")
      .select(col("event_id"), col("r_event_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    val composed = TemporalJoins.asOf(purchases, signups, "user_id", "ts",
        Map("event_id" -> "signup_event_id"))
      .select(col("event_id"), col("signup_event_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(native.nonEmpty && native == composed)
    assert(native.exists(_._2 == -1L) || composed.forall(_._2 != -1L),
      "null-extension parity")
  }

  test("planner inserts exchanges and sorts around AsOfJoinExec") {
    val df = TemporalJoins.asOfNative(purchases, signups, "user_id", "ts")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // AsOfJoinExec prints without "Exec"
    // both children must be clustered by key and sorted (key, time) —
    // the planner, not the operator, supplies the machinery
    assert("Exchange hashpartitioning\\((?:r_)?user_id".r
      .findAllIn(p).size >= 2, s"expected 2 key exchanges:\n$p")
    assert("Sort \\[(?:r_)?user_id".r.findAllIn(p).size >= 2,
      s"expected 2 (key, time) sorts:\n$p")
  }

  test("as-of edge cases: ties match, no-prior-right null-extends, long time type") {
    // left: (key, t) pairs; right: (key, t, tag)
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 6L, "c"))
      .toDF("k", "t", "tag")
    val out = TemporalJoins.asOfNative(left, right, "k", "t")
      .select(col("k"), col("t"), col("r_tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(out == Set(
      (1L, 10L, "a"),   // tie: right.t == left.t matches
      (1L, 20L, "b"),   // latest of several
      (2L, 5L, null),   // right exists for key but only LATER — null
      (3L, 7L, null)))  // key absent on right entirely — null
  }

  test("asOfNative rejects colliding attribute ids and missing columns") {
    val df = Seq((1L, 2L)).toDF("k", "t")
    intercept[RuntimeException] {
      TemporalJoins.asOfNative(df, df, "k", "missing")
    }
  }
}
