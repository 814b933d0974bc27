package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Clean

/** ScalaCheck property tests for the fragile scalar pieces (SURVEY.md §5.3):
  * the 4-format date parser (incl. its documented slash-format precedence),
  * garbage-to-null behavior, the contains-conditional weight (F8), and the
  * NaN scrubber (F2). Generators run seeded on the driver; each property is
  * checked in ONE Spark job over the generated table.
  */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))

  test("property: any rendered date parses per the coalesce precedence") {
    val gen = for {
      y <- Gen.choose(1900, 2030)
      m <- Gen.choose(1, 12)
      dd <- Gen.choose(1, 28)
      fmt <- Gen.choose(0, 3)
    } yield (y, m, dd, fmt)
    val cases = samples(gen, 400).map { case (y, m, dd, fmt) =>
      val rendered = fmt match {
        case 0 => f"$m%02d/$dd%02d/$y%04d"
        case 1 => f"$y%04d-$m%02d-$dd%02d"
        case 2 => f"$dd%02d-$m%02d-$y%04d"
        case 3 => f"$dd%02d/$m%02d/$y%04d"
      }
      // the reference tries MM/dd/yyyy first, so a dd/MM/yyyy rendering
      // with day ≤ 12 is (correctly, per reference semantics) read
      // month-first — the property encodes that precedence
      val (em, ed) = if (fmt == 3 && dd <= 12) (dd, m) else (m, dd)
      (rendered, f"$y%04d-$em%02d-$ed%02d")
    }
    val df = cases.toDF("dstr", "expected")
      .withColumn("parsed",
        date_format(Clean.parseDateMulti(col("dstr")), "yyyy-MM-dd"))
    val bad = df.filter(col("parsed").isNull ||
      col("parsed") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("property: digit-free garbage always parses to null") {
    val garbage = samples(Gen.asciiPrintableStr, 300)
      .map(_.take(30)).filter(s => s.nonEmpty && !s.exists(_.isDigit))
    assert(garbage.nonEmpty)
    val nonNull = garbage.toDF("dstr")
      .withColumn("parsed", Clean.parseDateMulti(col("dstr")))
      .filter(col("parsed").isNotNull).count()
    assert(nonNull == 0)
  }

  test("property: sort-based groupedQuantiles equals builtin percentile on random data") {
    // random group sizes (incl. tiny), duplicate values, negative values,
    // and arbitrary p — the sort-based rewrite must match Spark's exact
    // percentile aggregate everywhere, not just the lineitem fixture
    val gen = for {
      g <- Gen.choose(0, 4)
      v <- Gen.oneOf(Gen.choose(-100, 100).map(_.toDouble),
        Gen.choose(0, 5).map(_.toDouble)) // heavy duplicates
    } yield (s"g$g", v)
    val rows = samples(gen, 500)
    val df = rows.toDF("g", "v")
    for (p <- List(0.0, 0.1, 0.25, 0.5, 0.9, 1.0)) {
      val got = graft.operators.Percentiles
        .groupedQuantiles(df, "g", "v", Seq(p -> "q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = df.groupBy("g").agg(percentile(col("v"), lit(p)).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet, s"p=$p groups")
      got.foreach { case (g, q) =>
        assert(math.abs(q - want(g)) < 1e-9, s"p=$p group=$g: $q vs ${want(g)}")
      }
    }
  }

  test("property: contains-conditional weight matches driver-side eval") {
    val gen = for {
      base <- Gen.alphaStr.map(_.take(20))
      insert <- Gen.oneOf("", "Cup", "Euro", "cup", "EURO")
      pos <- Gen.choose(0, 20)
    } yield {
      val p = math.min(pos, base.length)
      base.substring(0, p) + insert + base.substring(p)
    }
    val cases = samples(gen, 300).zipWithIndex.map(_.swap)
    val got = cases.toDF("id", "t")
      .withColumn("w",
        when(col("t").contains("Cup") || col("t").contains("Euro"), 1)
          .otherwise(100))
      .orderBy("id").select("w").collect().map(_.getInt(0))
    val want = cases.map { case (_, t) =>
      if (t.contains("Cup") || t.contains("Euro")) 1 else 100
    }
    assert(got.toSeq == want)
  }

  test("property: redact is idempotent and leaves clean text untouched") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val dirtyPart = Gen.oneOf(
      word.map(w => s"$w@host.example.com"),
      word.map(w => s"https://x.example.org/$w"),
      Gen.choose(100000L, 99999999L).map(_.toString))
    val gen = for {
      pre <- word; mid <- word; post <- word
      dirty <- Gen.option(dirtyPart)
    } yield dirty match {
      case Some(x) => s"$pre $x $mid $post"
      case None => s"$pre $mid $post"
    }
    val cases = samples(gen, 300).zipWithIndex.map(_.swap)
    val out = cases.toDF("id", "t")
      .withColumn("r1", graft.text.TextFunctions.redact(col("t")))
      .withColumn("r2", graft.text.TextFunctions.redact(col("r1")))
      .orderBy("id").collect()
    out.foreach { r =>
      val (t, r1, r2) = (r.getString(1), r.getString(2), r.getString(3))
      assert(r1 == r2, s"not idempotent: '$r1' vs '$r2'")
      assert(!r1.contains("@") && !r1.contains("http"), s"leak in '$r1'")
      // clean inputs (no planted dirty part) pass through verbatim
      if (!t.exists(_.isDigit) && !t.contains("@") && !t.contains("http"))
        assert(r1 == t)
    }
  }

  test("property: fingerprint obeys the rolling-hash composition law") {
    // fp(a ++ b) = (fp(a) * 31^|b| + fpFromZero(b)) mod M — the property
    // that makes the fold a true polynomial hash (order-sensitive,
    // incrementally computable); checked against driver-side math
    val M = 1000000007L
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val gen = for { a <- word; b <- word } yield (a, b)
    def fpLocal(s: String, seed: Long): Long =
      s.foldLeft(seed)((acc, c) => (acc * 31 + c.toLong) % M)
    val cases = samples(gen, 200).zipWithIndex.map(_.swap)
    val got = cases.map { case (id, (a, b)) => (id, a + b) }.toDF("id", "t")
      .withColumn("fp", graft.text.TextFunctions.fingerprint(col("t")))
      .orderBy("id").select("fp").collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((_, (a, b)), sparkFp) =>
      val pow = b.foldLeft(1L)((acc, _) => acc * 31 % M)
      val composed = (fpLocal(a, 0L) * pow % M + fpLocal(b, 0L)) % M
      assert(sparkFp == composed, s"fp('$a'++'$b')")
      assert(sparkFp == fpLocal(a + b, 0L))
    }
  }

  test("property: idSplit bucket arithmetic matches the driver-side replay") {
    val gen = Gen.choose(0L, 10000000L)
    val cases = samples(gen, 400).distinct.zipWithIndex.map(_.swap)
    val got = graft.operators.Scale
      .idSplit(cases.map(_._2).toDF("doc_id"), "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.map(_._2).foreach { id =>
      val b = pctBucketLocal(id)
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(got(id) == want, s"id $id bucket $b")
    }
  }

  /** Driver-side replay of Scale.pctBucket (multiplier 2654435761):
    * Knuth permutation then HIGH-bit extraction. */
  private def pctBucketLocal(id: Long): Long = {
    val perm = java.lang.Math.floorMod(
      java.lang.Math.floorMod(id, 2147483648L) * 2654435761L, 2147483648L)
    (perm * 100L) >>> 31
  }

  test("property: idSplit never overflows, even at Long-extreme ids") {
    // the pre-fix form (id * 2654435761 unmasked) throws
    // ARITHMETIC_OVERFLOW under ANSI from id ≈ 3.47e9; the 31-bit mask
    // must keep ANY id legal and replayable
    val gen = Gen.oneOf(
      Gen.choose(0L, Long.MaxValue),
      Gen.const(Long.MaxValue), Gen.const(3470000000L), Gen.const(1L << 62))
    val cases = samples(gen, 200).distinct.zipWithIndex.map(_.swap)
    val got = graft.operators.Scale
      .idSplit(cases.map(_._2).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.map(_._2).foreach { id =>
      val b = pctBucketLocal(id)
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(got(id) == want, s"id $id bucket $b")
    }
  }

  test("property: per-row band buckets equal aggregated ones on random docs") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val doc = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val cases = samples(doc, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = cases.toDF("doc_id", "text")
    val viaAgg = graft.dedup.Dedup.bandBuckets(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaExpr = graft.dedup.Dedup.shingleHashSets(df)
      .select(col("doc_id"),
        posexplode(graft.dedup.Dedup.bandBucketArray(col("hs"))).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaExpr == viaAgg)
  }

  test("property: heavy-hitter counts are exact on random corpora at any bucket budget") {
    // Zipf-ish random corpus; whatever the collision pressure, every
    // (token, cnt) HeavyHitters reports must equal the true global count
    val gen = for {
      rank <- Gen.frequency(8 -> Gen.choose(0, 9), 2 -> Gen.choose(10, 499))
    } yield s"tok$rank"
    val toks = samples(gen, 2000).toDF("token")
    val truth = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(16, 256, 1 << 16).foreach { buckets =>
      val got = graft.text.HeavyHitters.topTokens(toks, 10, numBuckets = buckets)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(got.length == 10)
      got.foreach { case (t, c) =>
        assert(truth(t) == c, s"buckets=$buckets token=$t")
      }
    }
  }

  test("property: tokenBudgetSample never exceeds budget and is append-prefix-stable") {
    val gen = for {
      src <- Gen.oneOf("a", "b", "c")
      n <- Gen.choose(1L, 50L)
    } yield (src, n)
    val rows = samples(gen, 300).zipWithIndex
      .map { case ((src, n), i) => (i.toLong, src, n) }
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val kept = graft.operators.Scale
      .tokenBudgetSample(df, "doc_id", "source", "n_tokens", 200L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // budget respected per stratum
    kept.groupBy(_._2).foreach { case (src, ks) =>
      assert(ks.map(_._3).sum <= 200L, s"stratum $src over budget")
    }
    assert(kept.nonEmpty)
    // append stability: adding NEW docs can displace only docs hashed
    // AFTER them — every previously-kept doc that still fits its
    // stratum's hash-prefix stays kept. Weaker but exact invariant: the
    // selection over the original rows is reproducible verbatim
    val again = graft.operators.Scale
      .tokenBudgetSample(df, "doc_id", "source", "n_tokens", 200L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.toSet == again.toSet)
    // and a stratum absent from the data contributes nothing / no crash
    val empty = graft.operators.Scale
      .tokenBudgetSample(df.filter(col("source") === "zzz"),
        "doc_id", "source", "n_tokens", 200L)
    assert(empty.count() == 0)
  }

  test("property: stratifiedHashSample 0% drops all, 100% keeps all, unknown stratum drops") {
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "x" else "y"))
    val df = rows.toDF("doc_id", "lang")
    assert(graft.operators.Scale
      .stratifiedHashSample(df, "doc_id", "lang", Map("x" -> 0, "y" -> 0)).count() == 0)
    assert(graft.operators.Scale
      .stratifiedHashSample(df, "doc_id", "lang", Map("x" -> 100, "y" -> 100)).count() == 200)
    // stratum not in the map → dropped entirely
    assert(graft.operators.Scale
      .stratifiedHashSample(df, "doc_id", "lang", Map("x" -> 100)).count() == 100)
  }

  test("property: nanToNull removes every NaN, preserves everything else") {
    val gen = Gen.frequency(
      6 -> Gen.choose(-1e6, 1e6),
      2 -> Gen.const(Double.NaN),
      1 -> Gen.const(Double.PositiveInfinity),
      1 -> Gen.const(Double.NegativeInfinity))
    val cases = samples(gen, 400).zipWithIndex.map(_.swap)
    val scrubbed = Clean.nanToNull(cases.toDF("id", "x"), Seq("x"))
      .orderBy("id").select("x").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    cases.map(_._2).zip(scrubbed).foreach { case (in, out) =>
      if (in.isNaN) assert(out.isEmpty, "NaN survived")
      else assert(out.contains(in), s"$in changed to $out")
    }
  }

  test("property: groupedMedianLow equals the in-memory rank-⌈n/2⌉ pick") {
    val gen = for {
      g <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.frequency( // skew toward one repeated value: tie coverage
        4 -> Gen.choose(-1000, 1000).map(_ / 10.0),
        1 -> Gen.const(0.05))
    } yield (g, v)
    val cases = samples(gen, 500)
    val want = cases.groupBy(_._1).map { case (g, rows) =>
      val vs = rows.map(_._2).sorted
      g -> vs((vs.size + 1) / 2 - 1)
    }
    val got = graft.operators.Percentiles
      .groupedMedianLow(cases.toDF("g", "v"), "g", "v", "m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, s"$got vs $want")
  }

  test("property: groupedWeightedMedian equals the brute-force cumulative pick") {
    // tie-heavy values (0.5 granularity) exercise the tie-run argument
    // in the operator doc; weight 0 rows must not shift the answer
    val gen = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 20).map(_ / 2.0)
      w <- Gen.frequency(5 -> Gen.choose(1L, 9L), 1 -> Gen.const(0L))
    } yield (g, v, w)
    val cases = samples(gen, 400)
    val want = cases.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val tw = sorted.map(_._2).sum
      var cum = 0L
      g -> sorted.collectFirst {
        case (v, w) if { cum += w; cum * 2 >= tw } => v
      }.get
    }
    val got = graft.operators.Percentiles
      .groupedWeightedMedian(cases.toDF("g", "v", "w"), "g", "v", "w", "m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, s"$got vs $want")
  }

  test("property: hourlyPeakConcurrency equals a brute-force time scan") {
    // random closed intervals inside a 3-hour span, duplicates and
    // point-intervals included
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val gen = for {
      s <- Gen.choose(0, 10800)
      len <- Gen.frequency(3 -> Gen.choose(0, 5400), 1 -> Gen.const(0))
    } yield (s, math.min(10800, s + len))
    val cases = samples(gen, 300)
    val iv = cases.map { case (s, e) =>
      (new java.sql.Timestamp(base + s * 1000L),
        new java.sql.Timestamp(base + e * 1000L))
    }.toDF("s", "e")
    val got = graft.operators.Intervals.hourlyPeakConcurrency(iv)
      .collect()
      .map(r => ((r.getTimestamp(0).getTime - base) / 3600000L,
        r.getLong(1), r.getLong(2))).sortBy(_._1)
    // brute force: concurrency at second t = #{intervals with s ≤ t ≤ e};
    // per-hour peak over every second touched by that hour
    val want = (0L to 3L).flatMap { h =>
      val secs = (h * 3600 to math.min(10800, h * 3600 + 3599)).map { t =>
        cases.count { case (s, e) => s <= t && t <= e }
      }
      val starts = cases.count { case (s, _) => s / 3600 == h && s <= 10800 }
      val hasBoundary = cases.exists { case (s, e) => s / 3600 == h || e / 3600 == h }
      if (hasBoundary) Some((h, secs.max.toLong, starts.toLong)) else None
    }
    assert(got.toSeq == want.toSeq, s"${got.toSeq} vs $want")
  }
}
