package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics32

/** Independent in-memory referees for the r9 batch-14 queries. */
class Analytics32Spec extends AnyFunSuite with SharedSpark {

  private def docs(): Array[(Long, String, String, Seq[String])] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).trim.split("\\s+").toSeq.filter(_.nonEmpty)))

  test("naive bayes: full train/score replay") {
    val ds = docs()
    val train = ds.filter(_._1 % 2 == 0)
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    val tl = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val dl = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    train.foreach { case (_, lang, _, toks) =>
      dl(lang) += 1
      toks.foreach { w =>
        cnt((w, lang)) = cnt.getOrElse((w, lang), 0L) + 1; tl(lang) += 1
      }
    }
    val vocab = cnt.keys.map(_._1).toSet
    val vSize = vocab.size
    val dTot = dl.values.sum
    val langs = dl.keys.toSeq.sorted
    def wMicro(w: String, l: String): Long =
      math.round(math.log((cnt.getOrElse((w, l), 0L) + 1).toDouble / (tl(l) + vSize)) * 1e6)
    val prior = langs.map(l => l -> math.round(math.log(dl(l).toDouble / dTot) * 1e6)).toMap
    val conf = scala.collection.mutable.Map.empty[(String, String), Long]
    ds.filter(_._1 % 2 == 1).foreach { case (_, actual, _, toks) =>
      val known = toks.filter(vocab)
      if (known.nonEmpty) {
        val scores = langs.map(l => l -> (prior(l) + known.map(wMicro(_, l)).sum))
        // argmax with tie-break on lang asc
        val best = scores.filter(_._2 == scores.map(_._2).max).map(_._1).min
        conf((actual, best)) = conf.getOrElse((actual, best), 0L) + 1
      }
    }
    val got = Analytics32.qNaiveBayes(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == conf.toMap)
    // the diagonal should dominate no worse than chance on 5 classes
    val diag = got.collect { case ((a, p), n) if a == p => n }.sum
    assert(diag * 5 >= got.values.sum)
  }

  test("simpson diversity: collision-probability replay") {
    val ds = docs()
    val bySrc = ds.groupBy(_._3)
    val expected = bySrc.map { case (src, g) =>
      val counts = g.flatMap(_._4).groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val coll = counts.map(c => BigInt(c) * (c - 1)).sum
      src -> ((n, counts.size.toLong, (coll * 1000000 / (BigInt(n) * (n - 1))).toLong))
    }
    val got = Analytics32.qSimpsonDiversity(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    got.values.foreach { case (_, _, ppm) => assert(ppm >= 0 && ppm <= 1000000) }
  }

  test("burrows delta: z-profile distance replay") {
    val ds = docs()
    val toks = ds.flatMap(t => t._4.map(w => (t._3, w)))
    val top = toks.groupBy(_._2).map { case (w, g) => (w, g.length) }.toSeq
      .sortBy(t => (-t._2, t._1)).take(50).map(_._1)
    val srcTot = toks.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
    val sources = srcTot.keys.toSeq.sorted
    val fPpm = (for (w <- top; s <- sources) yield {
      val c = toks.count(t => t._1 == s && t._2 == w).toLong
      (w, s) -> c * 1000000L / srcTot(s)
    }).toMap
    val zMicro = (for (w <- top) yield {
      val fs = sources.map(s => fPpm((w, s)))
      val k = fs.length
      val sf = fs.sum; val sff = fs.map(f => f * f).sum
      val mean = sf.toDouble / k
      val sd = math.sqrt((sff.toDouble - sf.toDouble * (sf.toDouble / k)) / (k - 1))
      w -> sources.map(s => s -> math.round((fPpm((w, s)) - mean) / sd * 1e6)).toMap
    }).toMap
    val expected = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield {
      val (s1, s2) = (sources(i), sources(j))
      val sumAbs = top.map(w => math.abs(zMicro(w)(s1) - zMicro(w)(s2))).sum
      (s1, s2) -> sumAbs / top.length
    }).toMap
    val got = Analytics32.qBurrowsDelta(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("char trigrams: census replay per lang") {
    val ds = docs()
    val byLang = Tables.documents(spark, sfDir)
      .select(col("lang"), lower(col("text"))).collect()
      .map(r => (r.getString(0), r.getString(1))).filter(_._2.length >= 3)
    val expected = byLang.groupBy(_._1).map { case (lang, g) =>
      val tris = g.flatMap { case (_, t) => (0 to t.length - 3).map(i => t.substring(i, i + 3)) }
      val cnt = tris.groupBy(identity).map { case (tr, o) => (tr, o.length.toLong) }
      val nTri = tris.length.toLong
      val top5 = cnt.toSeq.sortBy(t => (-t._2, t._1)).take(5).zipWithIndex
        .map { case ((tr, c), ix) => (ix + 1L, tr, c, c * 1000000L / nTri) }
      lang -> top5
    }
    val _ = ds
    val got = Analytics32.qCharTrigrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).map { case (l, rows) =>
        l -> rows.sortBy(_._2).map(t => (t._2, t._3, t._4, t._5)).toSeq }
    assert(got == expected)
  }

  test("hapax: count-of-counts replay") {
    val ds = docs()
    val expected = ds.groupBy(_._3).map { case (src, g) =>
      val counts = g.flatMap(_._4).groupBy(identity).map(_._2.length.toLong)
      val vocab = counts.size.toLong
      val hapax = counts.count(_ == 1L).toLong
      src -> ((vocab, hapax, counts.sum, hapax * 1000000L / vocab))
    }
    val got = Analytics32.qHapax(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }
}
