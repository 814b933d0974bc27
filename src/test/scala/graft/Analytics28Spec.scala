package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics28

/** Independent in-memory referees for the r9 batch-10 queries. */
class Analytics28Spec extends AnyFunSuite with SharedSpark {

  test("itemset3: combinations replay over collected baskets") {
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val support = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    items.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length; k <- (j + 1) until ps.length)
        support((ps(i), ps(j), ps(k))) =
          support.getOrElse((ps(i), ps(j), ps(k)), 0L) + 1
    }
    val expected = support.values.groupBy(identity)
      .map { case (sup, g) => sup -> g.size.toLong }
    val got = Analytics28.qItemset3(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("interpolate linear: gap fill replay, anchors untouched") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1).toIndexedSeq
    val known = daily.toMap
    val d0 = daily.head._1; val d1 = daily.last._1
    val expected = (d0 to d1).map { d =>
      known.get(d) match {
        case Some(v) => d -> ((v, 0L))
        case None =>
          val (pi, pv) = daily.takeWhile(_._1 < d).last
          val (ni, nv) = daily.dropWhile(_._1 < d).head
          d -> ((pv + (nv - pv) * (d - pi) / (ni - pi), 1L))
      }
    }.toMap
    val got = Analytics28.qInterpolateLinear(spark, sfDir).collect()
      .map(r => java.time.LocalDate.parse(r.getString(0)).toEpochDay ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.values.count(_._2 == 1L) == (d1 - d0 + 1 - daily.length))
  }

  test("iqr fences: selection quartile replay") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ec"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = li.groupBy(_._1).map { case (flag, g) =>
      val xs = g.map(_._2).sorted
      val n = xs.length.toLong
      val q1 = xs(((n + 3) / 4 - 1).toInt)
      val q3 = xs(((3 * n + 3) / 4 - 1).toInt)
      val below = xs.count(_ * 2 < q1 * 5 - q3 * 3).toLong
      val above = xs.count(_ * 2 > q3 * 5 - q1 * 3).toLong
      flag -> ((n, q1, q3, below, above, (below + above) * 1000000L / n))
    }
    val got = Analytics28.qIqrFences(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
  }

  test("growth accounting: per-user day-set replay, ledger identity") {
    val act = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val byUser = act.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).sorted }
    val days = act.map(_._2).distinct.sorted
    val activeOn = days.map(d => d -> act.filter(_._2 == d).map(_._1).toSet).toMap
    val rows = Analytics28.qGrowthAccounting(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      days.map(java.time.LocalDate.ofEpochDay(_).toString).toSeq)
    rows.zip(days).foreach { case (r, d) =>
      val users = activeOn(d)
      val nNew = users.count(u => byUser(u).head == d)
      val nRet = users.count(u => { val i = byUser(u).indexOf(d)
        i > 0 && byUser(u)(i - 1) == d - 1 })
      val nRes = users.count(u => { val i = byUser(u).indexOf(d)
        i > 0 && byUser(u)(i - 1) < d - 1 })
      assert(r.getLong(1) == users.size.toLong)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((nNew.toLong, nRet.toLong, nRes.toLong)))
      // ledger identity: active = new + retained + resurrected
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4))
      val expChurn = if (!activeOn.contains(d - 1)) {
        if (days.head == d) 0L else activeOn.getOrElse(days(days.indexOf(d) - 1), Set.empty[Long]).size.toLong
      } else (activeOn(d - 1) -- users).size.toLong
      assert(r.getLong(5) == expChurn)
    }
  }

  test("u-shape attribution: full credit replay from raw events") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val purch = ev.filter(_._1 == "purchase")
    val touch = ev.filter(t => Set("click", "view", "signup")(t._1))
    val credit = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val nPurch = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    val nFirst = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nLast = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    purch.foreach { case (_, u, pId, pUs) =>
      val hits = touch.filter(t => t._2 == u && t._4 <= pUs && pUs - t._4 < 86400000000L)
        .sortBy(t => (t._4, t._3))
      val n = hits.length
      hits.zipWithIndex.foreach { case ((ch, _, _, _), i) =>
        val c = if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        credit(ch) += c
        nPurch.getOrElseUpdate(ch, scala.collection.mutable.Set.empty) += pId
        if (i == 0) nFirst(ch) += 1
        if (i == n - 1) nLast(ch) += 1
      }
    }
    val got = Analytics28.qAttrUshape(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expected = credit.keys.map(ch =>
      ch -> ((credit(ch), nPurch(ch).size.toLong, nFirst(ch), nLast(ch)))).toMap
    assert(got == expected)
  }

  test("transition entropy: matrix replay within rounding slack") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cells = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).values.foreach { g =>
      val ordered = g.sortBy(t => (t._3, t._4)).map(_._2).toList
      ordered.sliding(2).foreach {
        case a :: b :: Nil => cells((a, b)) = cells.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val expected = cells.toSeq.groupBy(_._1._1).map { case (prev, g) =>
      val r = g.map(_._2).sum
      val ent = g.map { case (_, c) =>
        math.round(-(c.toDouble / r) * math.log(c.toDouble / r) * 1e6)
      }.sum
      prev -> ((r, g.size.toLong, ent))
    }
    val got = Analytics28.qTransitionEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // entropy of a 5-state row is bounded by ln(5) ≈ 1.609e6 micro-nats
    got.values.foreach(v => assert(v._3 >= 0 && v._3 <= 1700000L))
  }
}
