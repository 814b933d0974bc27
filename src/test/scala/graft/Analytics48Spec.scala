package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics48

/** Independent in-memory referees for the r9 batch-30 queries. */
class Analytics48Spec extends AnyFunSuite with SharedSpark {

  private def docs(): Array[(String, Seq[String])] =
    Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.split("\\s+").toSeq.filter(_.nonEmpty)))

  test("chao1: count-of-counts replay; estimate >= observed V") {
    val expected = docs().groupBy(_._1).map { case (src, g) =>
      val counts = g.flatMap(_._2).groupBy(identity).map(_._2.size.toLong)
      val v = counts.size.toLong
      val f1 = counts.count(_ == 1L).toLong
      val f2 = counts.count(_ == 2L).toLong
      src -> ((v, f1, f2, v + f1 * f1 / (2 * math.max(f2, 1L)),
        v + f1 * (f1 - 1) / (2 * (f2 + 1))))
    }
    val got = Analytics48.qChao1(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
    got.values.foreach { case (v, _, _, c1, c1bc) =>
      assert(c1 >= v && c1bc >= v)
    }
  }

  test("good-turing: trigram spectrum replay; discounts below raw for r=1") {
    val grams = docs().flatMap(_._2.sliding(3).filter(_.length == 3).map(_.mkString(" ")))
    val spec = grams.groupBy(identity).map(_._2.length.toLong)
      .groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val n = grams.length.toLong
    val got = Analytics48.qGoodTuring(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    (1L to 5L).filter(r => spec.contains(r) && spec.contains(r + 1)).foreach { r =>
      val (nr, nr1, rstar, p0) = got(r)
      assert(nr == spec(r) && nr1 == spec(r + 1))
      assert(rstar == (r + 1) * spec(r + 1) * 1000L / spec(r))
      assert(p0 == spec(1L) * 1000000L / n)
    }
    // Good-Turing discounts singletons: 1* < 1 when the spectrum decays
    assert(got(1L)._3 < 1000L)
  }

  test("distinct-n: census replay; distinct-2 exceeds distinct-1") {
    val expected = docs().groupBy(_._1).map { case (src, g) =>
      val unis = g.flatMap(_._2)
      val bis = g.flatMap(_._2.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      src -> ((unis.distinct.size.toLong, unis.size.toLong,
        bis.distinct.size.toLong, bis.size.toLong,
        unis.distinct.size.toLong * 1000000L / unis.size,
        bis.distinct.size.toLong * 1000000L / bis.size))
    }
    val got = Analytics48.qDistinctN(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
    // bigram diversity dominates unigram diversity in a tiny-vocab corpus
    got.values.foreach { case (_, _, _, _, p1, p2) => assert(p2 >= p1) }
  }
}
