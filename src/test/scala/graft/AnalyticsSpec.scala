package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics

/** Semantic property tests for the r7b analytics batch — each query's
  * defining invariant replayed brute-force on collected sf0.001 data
  * (registry/oracle runs cover execution and cross-engine equality;
  * these pin the MEANING against an independent in-memory referee).
  */
class AnalyticsSpec extends AnyFunSuite with SharedSpark {

  test("skyline rows are exactly the non-dominated parts (brute-force referee)") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_partkey").cast("long"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def dominated(p: (String, Long, Long, Long)) = parts.exists { q =>
      q._1 == p._1 && q._2 != p._2 &&
        q._3 <= p._3 && q._4 >= p._4 && (q._3 < p._3 || q._4 > p._4)
    }
    val expected = parts.filterNot(dominated)
      .map(p => (p._1, p._2, p._3, p._4)).toSet
    val got = Analytics.qSkyline(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("containment is directional and integer-thresholded (brute-force referee)") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(t: String): Set[String] = {
      val ts = t.trim.split("\\s+")
      if (ts.length < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val shs = docs.map { case (id, t) => id -> sh(t) }.filter(_._2.nonEmpty)
    val expected = (for {
      (a, sa) <- shs.toSeq; (b, sb) <- shs.toSeq if a != b
      common = (sa & sb).size
      if common * 5 >= sa.size * 4
    } yield (a, b, sa.size.toLong, common.toLong)).toSet
    val got = Analytics.qContainment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // direction matters: at least one pair where a⊂b holds but b⊂a doesn't
    // would be invisible to a symmetric (a<b)-keyed join
    assert(got.nonEmpty)
  }

  test("attribution conserves credit: totals equal the purchase count up to integer-div remainders") {
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    val rows = Analytics.qAttribution(spark, sfDir).collect()
    val total = rows.map(_.getDouble(1)).sum
    // each attributed purchase distributes n·(1000000 div n) ≤ 10⁶ micro-
    // units, short by < n·1e-6; direct purchases contribute exactly 1.0
    assert(total <= purchases + 1e-6, s"credit $total exceeds purchases $purchases")
    assert(total > purchases * 0.999, s"credit $total lost more than div remainders")
    assert(rows.map(_.getString(0)).toSet == Set("click", "view", "direct"))
  }

  test("k-center coreset matches the in-memory greedy referee") {
    val data = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var sel = Vector(data.head._1)
    var expectedRadii = Vector.empty[Double]
    while (sel.size < 8) {
      val selVecs = sel.map(id => data.find(_._1 == id).get._2)
      val far = data.map { case (id, v) => (id, selVecs.map(c => d2(v, c)).min) }
        .maxBy { case (id, dd) => (dd, -id) }
      sel = sel :+ far._1
      expectedRadii = expectedRadii :+ math.sqrt(far._2)
    }
    val got = graft.queries.Analytics.qCoreset(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toVector == sel, s"picks ${got.map(_._1).toVector} vs $sel")
    got.drop(1).map(_._2).zip(expectedRadii).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-5, s"radius $g vs $e")
    }
    // greedy k-center radii never increase
    val radii = got.drop(1).map(_._2)
    radii.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, s"radius grew: $a -> $b")
      case _ =>
    }
  }

  test("CDC chunker matches an in-memory rolling-hash referee and reassembles the text") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .limit(30).collect().map(r => r.getLong(0) -> r.getString(1))
    def refBounds(t: String): Vector[Long] = {
      val codes = t.map(_.toLong)
      val pow = Array.iterate(1L, 8)(_ * 31L)
      val cuts = (8 to codes.length).filter { i =>
        i < codes.length &&
          (0 until 8).map(j => codes(i - 8 + j) * pow(j)).sum % 64 == 0
      }.map(_.toLong).toVector
      cuts :+ codes.length.toLong
    }
    val df = spark.createDataFrame(docs.toSeq).toDF("doc_id", "text")
    val got = graft.text.Chunker.withChunks(df, "text")
      .select(col("doc_id"), col("bounds"), col("chunks"), col("text"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector,
        r.getSeq[String](2), r.getString(3)))
    val byId = docs.toMap
    got.foreach { case (id, bounds, chunks, text) =>
      assert(bounds == refBounds(byId(id)), s"doc $id boundary mismatch")
      assert(chunks.mkString == text, s"doc $id chunks don't reassemble")
    }
  }

  test("CDC boundaries are shift-invariant beyond the edit region") {
    val text = Tables.documents(spark, sfDir).select("text").limit(1)
      .collect().head.getString(0)
    val prefix = "INSERTED EDIT "
    val df = spark.createDataFrame(Seq((1L, text), (2L, prefix + text)))
      .toDF("id", "text")
    val b = graft.text.Chunker.withChunks(df, "text").select("id", "bounds")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val p = prefix.length
    // every original cut (not the end-of-doc bound) reappears shifted by
    // the edit length; new cuts can only exist inside the edit window
    val origCuts = b(1L).dropRight(1)
    val shiftedCuts = b(2L).dropRight(1).filter(_ >= p + 8)
    assert(shiftedCuts == origCuts.map(_ + p),
      s"cuts not shift-invariant: $shiftedCuts vs ${origCuts.map(_ + p)}")
  }

  test("compressibility: repetitive text scores lower than varied text, deterministically") {
    val df = spark.createDataFrame(Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam " * 8),
      (2L, (0 until 96).map(i => s"w${i * 7919 % 997}x${i * 104729 % 1009}").mkString(" "))
    )).toDF("doc_id", "text")
    def ratios = graft.text.Compressibility.withRatio(df)
      .select("doc_id", "ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r1 = ratios
    assert(r1(1L) < r1(2L), s"repetitive ${r1(1L)} should compress below varied ${r1(2L)}")
    assert(r1.values.forall(v => v > 0.0 && v < 2.0))
    assert(ratios == r1, "deflate ratios must be deterministic across runs")
  }

  test("temporal split puts exactly the first 4n/5 events of every user in train") {
    val perUser = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expTrain = perUser.values.map(n => n * 4 / 5).sum
    val got = graft.queries.Analytics.qTemporalSplit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("train") == expTrain, s"train ${got("train")} vs $expTrain")
    assert(got("train") + got("test") == perUser.values.sum)
  }

  test("large-star/small-star components equal min-label propagation on the same pair graph") {
    val pairs = graft.dedup.Dedup.jaccardPairs(
      Tables.documents(spark, sfDir), 0.6, maxDf = 16)
    val viaProp = graft.dedup.Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaStar = graft.graph.BigStar.components(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStar == viaProp,
      s"missing=${(viaProp -- viaStar).take(3)} extra=${(viaStar -- viaProp).take(3)}")
    assert(viaStar.nonEmpty)
  }

  test("epoch shuffle is deterministic and partitions every doc exactly once") {
    val total = Tables.documents(spark, sfDir).count()
    def run() = graft.queries.Analytics.qEpochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run(); val b = run()
    assert(a.sameElements(b), "epoch shuffle must be run-stable")
    assert(a.map(_._2).sum == total)
    assert(a.map(_._1).distinct.length == a.length)
  }

  test("welch z matches an in-memory recomputation from the raw purchases") {
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0) % 2, math.rint(r.getDouble(1) * 100).toLong))
    def stats(v: Long) = {
      val xs = vals.filter(_._1 == v).map(_._2)
      val n = xs.length.toDouble
      val s = xs.sum.toDouble
      val ss = xs.map(x => x.toDouble * x).sum
      (n, s / n / 100.0, (ss - s * s / n) / (n - 1) / 10000.0)
    }
    val (na, ma, va) = stats(0); val (nb, mb, vb) = stats(1)
    val z = math.rint((ma - mb) / math.sqrt(va / na + vb / nb) * 10000) / 10000
    val row = graft.queries.Analytics.qAbTest(spark, sfDir).collect().head
    assert(row.getLong(0) == na.toLong && row.getLong(1) == nb.toLong)
    assert(math.abs(row.getDouble(4) - z) < 1e-3, s"z ${row.getDouble(4)} vs $z")
  }

  test("ngram novelty: every source ratio is in (0, 1] and the earliest doc is fully novel") {
    val rows = Analytics.qNgramNovelty(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(2)
      assert(v > 0.0 && v <= 1.0, s"${r.getString(0)} novelty $v out of range")
    }
  }
}
