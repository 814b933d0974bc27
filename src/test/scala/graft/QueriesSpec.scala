package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level invariants over the full query registry at sf0.001: every
  * query runs, returns rows, and has stable column names (the
  * driver-contract essentials). Value-level correctness is the DuckDB
  * oracle's job (tools/oracle_check.py). */
class QueriesSpec extends AnyFunSuite with SharedSpark {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("typed TypedColumn aggregation equals the udaf fast path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val typed = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").as("v"), col("l_extendedprice").as("w"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.WeightedMean.toColumn.name("wmean"))
      .toDF("flag", "wmean")
      .select(col("flag"), round(col("wmean"), 4).as("wmean"))
      .orderBy("flag").collect()
    val untyped = graft.queries.Relational4.qWeightedMean(spark, sfDir).collect()
    assert(typed.sameElements(untyped))
  }

  test("hll union of per-group sketches equals one global sketch, tracks exact") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val merged = graft.queries.Relational2.qHllUnion(spark, sfDir)
      .head().getLong(0)
    // merge-correctness: unioning per-group sketches must give the SAME
    // estimate as sketching the whole column in one pass (the property
    // that makes rollup-from-sketches valid)
    val global = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))))
      .head().getLong(0)
    assert(merged == global, s"merged $merged != global $global")
    val exact = li.select("l_partkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged vs exact $exact")
  }

  test("q_approx_distinct: HLL++ estimate within 5% of the exact count") {
    // the rows-only adjudication for this query (PLANS.md): the sketch
    // value is engine-specific, so the spec pins the ESTIMATOR contract —
    // the query itself carries exact_parts alongside for the referee
    val r = graft.queries.Relational2.qApproxDistinct(spark, sfDir).head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(exact > 0 && math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("q_approx_percentile: GK sketch within rank tolerance of exact percentiles") {
    import org.apache.spark.sql.functions._
    // percentile_approx(accuracy=10000) guarantees rank error ≤ n/10000;
    // assert against the exact per-group percentiles with a generous
    // VALUE band (1% relative) — the estimator contract, engine-side only
    val approx = graft.queries.Relational3.qApproxPercentile(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((g, (a50, a95)) <- approx; (e50, e95) = exact(g)) {
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$g p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.01, s"$g p95: $a95 vs $e95")
    }
  }

  test("sort-based groupedQuantiles equals Spark's exact percentile aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // edge cases the lineitem oracle can't exercise: a 1-row group
    // (h integral at the last rank), nulls (ignored), an even-count
    // group (true interpolation between two values)
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", Some(10.0)),
      ("b", Some(5.0)),
      ("c", Some(4.0)), ("c", None), ("c", Some(8.0)), ("c", Some(6.0))
    ).toDF("g", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      val sorted = graft.operators.Percentiles
        .groupedQuantiles(df, "g", "v", Seq(p -> "q"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
      val builtin = df.groupBy("g")
        .agg(percentile(col("v"), lit(p)).as("q"))
        .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(sorted.sameElements(builtin), s"p=$p: ${sorted.toSeq} vs ${builtin.toSeq}")
    }
  }

  test("groupedMedianLow picks the datum at rank ⌈n/2⌉, ignoring nulls") {
    import spark.implicits._
    // odd group (exact middle), even group (LOWER of the two middles —
    // the property that makes it a datum, not an interpolation),
    // 1-row group, nulls ignored
    val df = Seq(
      ("a", Some(3.0)), ("a", Some(1.0)), ("a", Some(2.0)),
      ("b", Some(4.0)), ("b", Some(1.0)), ("b", Some(3.0)), ("b", Some(2.0)),
      ("c", Some(7.0)),
      ("d", Some(5.0)), ("d", None), ("d", Some(9.0))
    ).toDF("g", "v")
    val got = graft.operators.Percentiles
      .groupedMedianLow(df, "g", "v", "m")
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("a", 2.0), ("b", 2.0), ("c", 7.0), ("d", 5.0)))
  }

  test("q_stats_moments matches the same closed-form formula applied in-memory") {
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (flag, g) =>
      val n = g.length.toDouble
      val xs = g.map(_._2); val ys = g.map(_._3)
      val sx = xs.sum; val sx2 = xs.map(x => x * x).sum
      val sx3 = xs.map(x => x * x * x).sum; val sx4 = xs.map(x => x * x * x * x).sum
      val sy = ys.sum; val sy2 = ys.map(y => y * y).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val mu = sx / n
      val m2 = sx2 / n - mu * mu
      val m3 = sx3 / n - 3.0 * mu * (sx2 / n) + 2.0 * mu * mu * mu
      val m4 = sx4 / n - 4.0 * mu * (sx3 / n) + 6.0 * mu * mu * (sx2 / n) -
        3.0 * mu * mu * mu * mu
      def r4(v: Double) = math.rint(v * 10000) / 10000
      (flag, r4(m3 / (m2 * math.sqrt(m2))), r4(m4 / (m2 * m2) - 3.0),
        r4((n * sxy - sx * sy) /
          (math.sqrt(n * sx2 - sx * sx) * math.sqrt(n * sy2 - sy * sy))))
    }
    val got = graft.queries.Relational5.qStatsMoments(spark, sfDir)
      .orderBy("flag").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    expected.zip(got).foreach { case ((f, sk, ku, co), (gf, gsk, gku, gco)) =>
      assert(f == gf)
      // in-memory summation order differs from Spark's partial-merge
      // order; the 4-dp rounded values must still agree
      assert(math.abs(sk - gsk) < 2e-4, s"$f skew $sk vs $gsk")
      assert(math.abs(ku - gku) < 2e-4, s"$f kurt $ku vs $gku")
      assert(math.abs(co - gco) < 2e-4, s"$f corr $co vs $gco")
    }
  }

  test("q_robust_mad equals a brute-force in-memory MAD computation") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def medLow(vs: Seq[Double]): Double = vs.sorted.apply((vs.size + 1) / 2 - 1)
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (flag, g) =>
      val vs = g.map(_._2).toSeq
      val med = medLow(vs)
      val dvs = vs.map(v => math.abs(v - med))
      val mad = medLow(dvs)
      (flag, med, mad, dvs.count(_ > 2.0 * mad).toLong, vs.size.toLong)
    }
    val got = graft.queries.Relational5.qRobustMad(spark, sfDir)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected, s"${got.toSeq} vs $expected")
  }

  test("q_ntile_bucketize: decile sizes within each group differ by at most 1") {
    val got = graft.queries.Relational5.qNtileBucketize(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (flag, buckets) =>
      assert(buckets.length == 10, s"$flag has ${buckets.length} deciles")
      val sizes = buckets.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$flag sizes ${sizes.toSeq}")
    }
  }

  test("PageRank matches the hand-computed star-graph fixture, mass sums to 1") {
    import spark.implicits._
    // star: center 0 ↔ leaves 1..4, symmetrized. After 3 damped
    // iterations (d=0.85, N=5) the closed-form recurrence gives:
    //   r1: c=0.03+0.85·0.8=0.71          l=0.03+0.85·0.05=0.0725
    //   r2: c=0.03+0.85·0.29=0.2765       l=0.03+0.85·0.1775=0.180875
    //   r3: c=0.03+0.85·0.7235=0.644975   l=0.03+0.85·0.069125=0.08875625
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val und = e.union(e.select($"dst".as("src"), $"src".as("dst")))
    val (ranks, n) = graft.graph.PageRank.run(und)
    assert(n == 5)
    val got = ranks.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(got(0L) - 0.644975) < 1e-12, s"center ${got(0L)}")
    (1L to 4L).foreach { l =>
      assert(math.abs(got(l) - 0.08875625) < 1e-12, s"leaf $l ${got(l)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-12, "rank mass must sum to 1")
  }

  test("hourlyPeakConcurrency: carry-in, ties, and single-point intervals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t(m: String) = s"2024-01-01 $m:00"
    // hour 00: [00:10,00:50], [00:20,01:30], [00:40,00:45] → peak 3
    // hour 01: only the END of [00:20,01:30] — peak must be the CARRIED-IN
    //          level 1, not the post-decrement 0 (the subtle case)
    // hour 02: [02:05,02:05] single point (+1/−1 at one instant) AND
    //          [02:05,02:10] starting at the same instant → peak 2
    val iv = Seq(
      (t("00:10"), t("00:50")), (t("00:20"), t("01:30")),
      (t("00:40"), t("00:45")),
      (t("02:05"), t("02:05")), (t("02:05"), t("02:10"))
    ).toDF("s0", "e0")
      .select(to_timestamp($"s0").as("s"), to_timestamp($"e0").as("e"))
    val got = graft.operators.Intervals.hourlyPeakConcurrency(iv)
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(0).toString.substring(11, 13),
        r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("00", 3L, 3L), ("01", 1L, 0L), ("02", 2L, 2L)),
      got.toSeq.toString)
  }

  /** Queries whose result is legitimately empty at tiny scale factors
    * (no exact-duplicate texts are planted below sf0.1). */
  private val mayBeEmpty = Set("q_dedup_exact")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(df.count() > 0, s"$name returned 0 rows")
      else df.count() // still must execute
    }
  }
}
