package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Events2

/** Semantic referees for the r7t batch — JSON profile totals,
  * pseudonymization invariants, and dwell-gap recomputation.
  */
class Events2Spec extends AnyFunSuite with SharedSpark {

  test("json profile: presence totals cover every event exactly once per key") {
    val nEvents = Tables.events(spark, sfDir).count()
    val rows = Events2.qJsonProfile(spark, sfDir).collect()
    // testdata payloads all carry the single key 'k' with ints 0..99
    assert(rows.map(_.getString(1)).distinct.toSeq == Seq("k"))
    assert(rows.map(_.getLong(2)).sum == nEvents)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), "all values numeric")
      assert(r.getLong(4) >= 0 && r.getLong(5) <= 99)
    }
  }

  test("pseudonymize: mapping is injective-or-audited and repeatable") {
    val r1 = Events2.qPseudonymize(spark, sfDir).collect().head
    val r2 = Events2.qPseudonymize(spark, sfDir).collect().head
    assert(r1 == r2, "pseudonymization must be deterministic across runs")
    val (users, pseudos, collided, maxMult) =
      (r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
    assert(users == pseudos + (users - pseudos))
    assert(collided == 0 || maxMult > 1)
    // on this id domain the multiplicative hash is collision-free
    assert(users == pseudos && collided == 0 && maxMult == 1)
  }

  test("dwell stats: per-transition gaps match the in-memory replay") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val transitions: Seq[((String, String), Long)] =
      ev.groupBy(_._1).values.toSeq.flatMap { g =>
        val sorted = g.sortBy(e => (e._4, e._2)).toSeq
        sorted.zip(sorted.drop(1)).map { case (a, b) =>
          ((a._3, b._3), b._4 - a._4)
        }
      }
    val expect = transitions.groupBy(_._1).map { case (k, gs) =>
      val v = gs.map(_._2)
      k -> ((v.length.toLong, v.min, v.max, v.sum / v.length))
    }
    val got = Events2.qDwellStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expect)
  }
}
