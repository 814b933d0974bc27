package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics53

/** Independent in-memory referees for the r9 batch-35 queries (registered
  * in r10 without a spec — VERDICT r10 gap 3). */
class Analytics53Spec extends AnyFunSuite with SharedSpark {

  private def toks(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).take(40)

  test("needleman: classic full-table DP replay matches the fold") {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(2)
      .select("doc_id", "text")
      .collect().sortBy(_.getLong(0))
    val a = toks(docs.head.getString(1))
    val b = toks(docs.last.getString(1))
    // textbook O(nm) table, match +1 / mismatch & gap −1
    val dp = Array.ofDim[Long](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) dp(i)(0) = -i.toLong
    for (j <- 0 to b.length) dp(0)(j) = -j.toLong
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.max(
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 1 else -1),
        math.max(dp(i - 1)(j) - 1, dp(i)(j - 1) - 1))
    val row = Analytics53.qNeedleman(spark, sfDir).collect().head
    assert(row.getLong(0) == a.length.toLong)
    assert(row.getLong(1) == b.length.toLong)
    assert(row.getLong(2) == dp(a.length)(b.length))
    // global-alignment score bounds: at most #matches, at least all-gaps
    assert(row.getLong(2) <= math.min(a.length, b.length).toLong)
    assert(row.getLong(2) >= -(a.length + b.length).toLong)
  }

  test("lang edit distance: JVM levenshtein replay on the head strings") {
    def lev(s: String, t: String): Int = {
      val prev = Array.tabulate(t.length + 1)(identity)
      var p = prev
      for (i <- 1 to s.length) {
        val cur = new Array[Int](t.length + 1)
        cur(0) = i
        for (j <- 1 to t.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, p(j) + 1),
            p(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
        p = cur
      }
      p(t.length)
    }
    val rows = Analytics53.qLangEditDistance(spark, sfDir).collect()
    // 5 languages in the corpus → C(5,2) ordered pairs
    assert(rows.length == 10)
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    // rebuild the head-vocabulary strings the same way and replay
    val heads = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .withColumn("rn", expr("row_number() OVER (PARTITION BY lang ORDER BY c DESC, w)"))
      .filter(col("rn") <= 20)
      .orderBy("lang", "rn")
      .collect().groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getString(1)).mkString(" ") }
    rows.foreach { r =>
      val (h1, h2) = (heads(r.getString(0)), heads(r.getString(1)))
      val d = lev(h1, h2)
      assert(r.getLong(2) == d.toLong)
      assert(r.getLong(3) == d.toLong * 1000000L / math.max(h1.length, h2.length))
    }
  }

  test("circular stats: exact integer component sums replay") {
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) % 86400000000").as("us"))
      .collect()
    val byType = evs.groupBy(_.getString(0)).map { case (t, rs) =>
      val cs = rs.map { r =>
        val theta = r.getLong(1).toDouble / 86400000000.0 * 2 * math.Pi
        (math.round(math.cos(theta) * 1e6), math.round(math.sin(theta) * 1e6))
      }
      t -> (rs.length.toLong, cs.map(_._1).sum, cs.map(_._2).sum)
    }
    val rows = Analytics53.qCircularStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sc, ss) = byType(r.getString(0))
      assert(r.getLong(1) == n)
      // readout columns are the EXACT sums — no trig in the readout path
      assert(r.getLong(3) == sc)
      assert(r.getLong(4) == ss)
      val expectR = math.round(math.sqrt(sc.toDouble * sc + ss.toDouble * ss) / n)
      assert(r.getLong(2) == expectR)
      // resultant length cannot exceed the per-row magnitude bound
      assert(r.getLong(2) <= 1000001L)
    }
  }
}
