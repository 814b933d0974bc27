package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics38

/** Independent in-memory referees for the r9 batch-20 queries. */
class Analytics38Spec extends AnyFunSuite with SharedSpark {

  private val stopwords =
    Set("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  test("pretokenize: regex census replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val expected = docs.groupBy(_._1).map { case (lang, g) =>
      val ws = g.map(_._2.trim.split("\\s+").count(_.nonEmpty).toLong).sum
      val pre = g.map(t => pat.findAllIn(t._2.toLowerCase).length.toLong).sum
      lang -> ((g.size.toLong, ws, pre, pre * 1000000L / ws))
    }
    val got = Analytics38.qPretokenize(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
    // a letters+digits+punct pretokenizer never yields fewer tokens than whitespace
    got.values.foreach { case (_, ws, pre, _) => assert(pre >= ws) }
  }

  test("rake: full pipeline replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.trim.split("\\s+")
        .filter(_.nonEmpty).toSeq))
    // phrase runs: split on stopwords
    case class P(doc: Long, run: Int, words: Seq[String])
    val phrases = docs.flatMap { case (id, ws) =>
      var run = 0
      val buf = scala.collection.mutable.ArrayBuffer.empty[P]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      ws.foreach { w =>
        if (stopwords(w)) {
          if (cur.nonEmpty) buf += P(id, run, cur.toSeq)
          run += 1; cur = scala.collection.mutable.ArrayBuffer.empty
        } else cur += w
      }
      if (cur.nonEmpty) buf += P(id, run, cur.toSeq)
      buf.filter(p => p.words.length >= 2 && p.words.length <= 4)
    }
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val deg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    phrases.foreach(p => p.words.foreach { w =>
      freq(w) += 1; deg(w) += p.words.length
    })
    def scorePpm(w: String) = deg(w) * 1000000L / freq(w)
    val byPhrase = phrases.groupBy(_.words.mkString(" ")).map { case (ph, g) =>
      (ph, g.size.toLong, g.map(p => p.words.map(scorePpm).sum).max)
    }
    val expected = byPhrase.toSeq.sortBy(t => (-t._3, t._1)).take(10)
    val got = Analytics38.qRakeKeyphrases(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("simhash portable: per-doc signature replay on a sample") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(w: String): Long = {
      val hx = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hx.substring(0, 8), 16)
    }
    def sig(tokens: Set[String]): Long =
      (0 until 32).map { k =>
        val vote = tokens.toSeq.map(w => if ((h32(w) >> k & 1L) == 1L) 1 else -1).sum
        if (vote > 0) 1L << k else 0L
      }.sum
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet))
    val sigs = docs.map { case (id, ts) => (id, sig(ts)) }
    // replay the full banded histogram
    val hist = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val byBand = sigs.groupBy(_._2 / 16777216L)
    byBand.values.foreach { g =>
      for (i <- g.indices; j <- (i + 1) until g.length) {
        val hm = java.lang.Long.bitCount(g(i)._2 ^ g(j)._2).toLong
        hist(hm) += 1
      }
    }
    val got = Analytics38.qSimhashPortable(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hist.toMap)
    got.keys.foreach(h => assert(h >= 0 && h <= 32))
  }

  test("ipf raking: margins converge and weights stay near seed ratios") {
    val rows = Analytics38.qIpfRaking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // after a final COLUMN rake, column sums match targets to floor slack
    val o = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val colT = o.groupBy(_._2).map { case (c, g) => c -> g.size.toLong }
    rows.groupBy(_._2).foreach { case (c, g) =>
      val wsum = g.map(_._4).sum
      assert(math.abs(wsum - colT(c) * 1000000L) <= g.size.toLong,
        s"col $c gap ${wsum - colT(c) * 1000000L}")
    }
    // row gaps reported = actual row sums minus targets
    val rowT = o.groupBy(_._1).map { case (r0, g) => r0 -> g.size.toLong }
    rows.groupBy(_._1).foreach { case (r0, g) =>
      assert(g.map(_._5).distinct.size == 1)
      assert(g.head._5 == g.map(_._4).sum - rowT(r0) * 1000000L)
      // 3 full rounds bring rows within 0.1% of target
      assert(math.abs(g.head._5) < rowT(r0) * 1000L)
    }
  }
}
