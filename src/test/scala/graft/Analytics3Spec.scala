package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics3
import graft.functions.JaroWinkler

/** Semantic property tests for the r7d analytics batch — in-memory
  * referees for each query's defining invariant, plus the published
  * Jaro–Winkler reference values for the native expression kernel.
  */
class Analytics3Spec extends AnyFunSuite with SharedSpark {

  test("RFM: segments partition the purchasing users, quintiles balanced") {
    val rows = Analytics3.qRfmSegments(spark, sfDir).collect()
    val nUsers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nUsers, "segments must partition users")
    rows.foreach { r =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2)).foreach(q =>
        assert(q >= 1 && q <= 5, s"quintile out of range: $r"))
    }
    // marginal quintile sizes differ by at most 1 (exact-rank cut property)
    Seq(0, 1, 2).foreach { dim =>
      val marginal = rows.groupBy(_.getLong(dim)).view
        .mapValues(_.map(_.getLong(3)).sum).values.toSeq
      assert(marginal.max - marginal.min <= 1, s"unbalanced quintiles in dim $dim: $marginal")
    }
  }

  test("Gini/Lorenz matches a brute-force referee on sorted cents") {
    val xs = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    val n = xs.length.toLong
    val tot = xs.sum
    val ix = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = (2.0 * ix - (n + 1) * tot) / (n.toDouble * tot)
    val rows = Analytics3.qGiniLorenz(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(math.abs(rows.head.getDouble(4) - gini) < 1e-6, "gini mismatch")
    val shares = rows.map(_.getLong(3))
    assert(shares.zip(shares.tail).forall(p => p._1 <= p._2), "Lorenz must be monotone")
    assert(shares.last == 1000L, "full cumulative share must be 1000 milli")
    assert(rows.map(_.getLong(1)).sum == n)
  }

  test("autocorrelation matches the in-memory Pearson over lagged days") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts"))).agg(count(lit(1)))
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1)).toMap
    val got = Analytics3.qAutocorr(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    (1L to 7L).foreach { k =>
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d + k).map(y => (x, y)) }
      val np = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val r = (np * sxy - sx * sy).toDouble /
        (math.sqrt((np * sxx - sx * sx).toDouble) * math.sqrt((np * syy - sy * sy).toDouble))
      assert(got(k)._1 == np, s"pair count at lag $k")
      assert(math.abs(got(k)._2 - r) < 1e-6, s"r at lag $k: ${got(k)._2} vs $r")
    }
  }

  test("CUSUM: peak flag sits on the argmax of the exact scaled deviations") {
    val daily = Analytics3.qCusumChangepoint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = daily.length.toLong
    val tot = daily.map(_._2).sum
    var cum = 0L
    val referee = daily.sortBy(_._1).zipWithIndex.map { case ((d, x, _, _), t) =>
      cum += x
      (d, n * cum - (t + 1) * tot)
    }
    assert(daily.map(r => (r._1, r._3)).toSet == referee.toSet, "cusum curve mismatch")
    val peak = referee.map(r => math.abs(r._2)).max
    daily.foreach { case (d, _, c, f) =>
      assert((f == 1L) == (math.abs(c) == peak), s"peak flag wrong at day $d")
    }
    assert(daily.map(_._4).sum >= 1, "at least one peak row")
  }

  test("Jaro-Winkler kernel reproduces the published reference values") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334), // boost suppressed: no prefix
      ("abcdef", "abzzzz", 0.5555555555555555), // jaro <= 0.7: no boost despite prefix
      ("same", "same", 1.0), ("x", "y", 0.0), ("ab", "ba", 0.0))
    cases.foreach { case (a, b, exp) =>
      assert(math.abs(JaroWinkler.similarity(a, b) - exp) < 1e-12, s"$a / $b")
      assert(JaroWinkler.similarity(a, b) == JaroWinkler.similarity(b, a), "symmetry")
    }
  }

  /** Blocked-vs-all-pairs regression guard for the token-blocked
    * candidate generation: JW ≥ 0.92 does NOT formally imply a shared
    * whitespace token (a leading transposition inside a single long
    * token — "marthalively"/"amrthalively" — scores ≥ 0.92 with zero
    * shared tokens), so the blocking is a recall heuristic whose
    * zero-loss property on THIS name domain must be pinned by test, not
    * assumed. Brute-force all pairs driver-side at BOTH sf0.001 and
    * sf0.01 and assert set equality with the production blocked query —
    * any domain drift that introduces a dropped match fails here
    * instead of silently shrinking the output (the DuckDB oracle
    * replays the same blocking and cannot catch it). */
  test("record linkage: blocked output == all-pairs output (sf0.001 + sf0.01)") {
    Seq(sfDir, "/root/testdata/sf0.01").foreach { dir =>
      val parts = Tables.part(spark, dir).select("p_brand", "p_partkey", "p_name")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      val byBrand = parts.groupBy(_._1)
      val expected = (for {
        (_, grp) <- byBrand.toSeq
        a <- grp.toSeq; b <- grp.toSeq
        if a._2 < b._2
        jw = BigDecimal(JaroWinkler.similarity(a._3, b._3))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if jw >= 0.92
      } yield (a._1, a._2, b._2)).toSet
      val got = Analytics3.recordLinkagePairs(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"$dir: missing=${(expected -- got).take(3)} " +
        s"extra=${(got -- expected).take(3)}")
      assert(got.nonEmpty, s"$dir must contain linkable names")
    }
  }

  /** The r12 work-bound registry readout must carry EXACTLY the
    * information an aggregation of the full pair frame carries: per
    * brand, the pair count and the jw-weighted sum, derived
    * arithmetically from per-(brand, name) record counts without ever
    * enumerating the quadratic pair set. Reconcile the two paths. */
  test("record linkage census == aggregated full-pair frame (sf0.001 + sf0.01)") {
    import org.apache.spark.sql.functions._
    Seq(sfDir, "/root/testdata/sf0.01").foreach { dir =>
      val fromPairs = Analytics3.recordLinkagePairs(spark, dir)
        .groupBy("brand")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CAST(round(jw * 1000000) AS BIGINT)")).as("jw_micro_wsum"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val census = Analytics3.qRecordLinkage(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
      assert(census == fromPairs,
        s"$dir: census=$census vs pairs=$fromPairs")
      assert(census.nonEmpty, s"$dir must contain linkable names")
      // n_name_pairs is a census-only column: sanity-pin it positive
      Analytics3.qRecordLinkage(spark, dir).collect()
        .foreach(r => assert(r.getLong(1) > 0))
    }
  }

  test("hard negatives: top-3 other-label cosine neighbors per probe") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val probes = vecs.filter(_._1 % 50 == 0)
    val expected = probes.flatMap { case (qid, ql, qv) =>
      vecs.filter(v => v._1 != qid && v._2 != ql)
        .map(v => (v._1, round6(cos(qv, v._3)))) // rank on the ROUNDED sim, like the query
        .sortBy { case (nid, s) => (-s, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), i) => (qid, i + 1L, nid) }
    }.toSet
    val got = Analytics3.qHardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // a hard negative is never the probe's own label
    val gotLabels = Analytics3.qHardNegatives(spark, sfDir).collect()
    val labelOf = vecs.map(v => v._1 -> v._2).toMap
    gotLabels.foreach { r =>
      assert(labelOf(r.getLong(2)) != labelOf(r.getLong(0)), "own-label negative leaked")
    }
  }
}
