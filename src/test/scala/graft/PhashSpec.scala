package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Phash

/** Pins the perceptual-hash near-dup pipeline: planted twin recovery
  * (recall), pattern-collision-aware precision, hash determinism, and
  * the banding candidate guarantee.
  */
class PhashSpec extends AnyFunSuite with SharedSpark {

  private lazy val ids = Tables.documents(spark, sfDir).select("doc_id")
  private lazy val pairs = Phash.nearDupPairs(spark, Phash.patternPngs(spark, ids))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("every planted even/odd twin is recovered with a small hamming distance") {
    val docIds = ids.collect().map(_.getLong(0)).toSet
    val twins = docIds.filter(i => i % 2 == 0 && docIds(i + 1)).map(i => (i, i + 1))
    val found = pairs.map(p => (p._1, p._2)).toSet
    val missing = twins -- found
    assert(missing.isEmpty, s"planted twins missed: ${missing.take(5)}")
    val twinHams = pairs.filter(p => twins((p._1, p._2))).map(_._3)
    assert(twinHams.forall(_ <= 10), s"twin hamming too large: ${twinHams.max}")
  }

  test("every non-twin pair is a true pattern collision, not a hash error") {
    val nonTwin = pairs.filter(p => p._1 / 2 != p._2 / 2)
    nonTwin.foreach { case (a, b, hm) =>
      assert(Phash.patternParams(a / 2) == Phash.patternParams(b / 2),
        s"pair ($a, $b, hamming $hm) joins two visually distinct patterns")
    }
  }

  test("phash is deterministic and separates distinct patterns widely") {
    val png = Phash.patternPngs(spark, ids.limit(40))
    val h1 = Phash.hashes(spark, png).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Phash.hashes(spark, png).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2, "phash must be bit-stable across runs")
    // distinct patterns: median pairwise hamming far above the threshold
    val gidHash = h1.toSeq.groupBy(_._1 / 2)
      .map { case (g, vs) => g -> vs.head._2 }.toSeq
    val hams = for {
      (ga, ha) <- gidHash; (gb, hb) <- gidHash
      if ga < gb && Phash.patternParams(ga) != Phash.patternParams(gb)
    } yield java.lang.Long.bitCount(ha ^ hb)
    assert(hams.nonEmpty && hams.sorted.apply(hams.size / 2) > 10,
      s"distinct patterns too close: median ${hams.sorted.apply(hams.size / 2)}")
  }
}
