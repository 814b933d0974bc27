package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 23: distribution diagnostics — Hill tail index, Q–Q
  * against the normal on a LITERAL z grid (no erf⁻¹ at runtime),
  * Western Electric control-chart run rules, the Lo–MacKinlay
  * variance ratio, and the turning-point randomness test. µnat lns
  * where unavoidable (Hill, one per top-k row), exact integers
  * everywhere else.
  */
object Analytics41 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Hill estimator of the price tail index over the top-100 order
    * statistics: α̂⁻¹ = (1/k)Σln(xᵢ/x₍ₖ₊₁₎). Each log-ratio is one
    * µnat-rounded ln (integer sum, order-free); α̂ in exact ppm from
    * the integer mean via floor div. The heavy-tail companion of
    * q_zipf_fit.
    *
    * 100 TB shape: top-(k+1) via TakeOrderedAndProject — no global
    * sort; k is fixed. */
  val qHillTail: Q = (s, d) => {
    val top = Tables.orders(s, d)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"))
      .orderBy(col("pc").desc).limit(101)
    val xk = top.orderBy(col("pc").asc).limit(1)
      .select(col("pc").as("x_ref"))
    top.orderBy(col("pc").desc).limit(100)
      .join(broadcast(xk))
      .select(expr(
        "CAST(round(ln(CAST(pc AS DOUBLE) / x_ref) * 1000000) AS BIGINT)").as("l"))
      .agg(count(lit(1)).as("k"), sum("l").as("sum_ln_micro"))
      .select(col("k"), col("sum_ln_micro"),
        expr("CAST((k * 1000000 * 1000000) div sum_ln_micro AS BIGINT)")
          .as("alpha_ppm"))
  }

  /** Q–Q points of daily revenue against the fitted normal at the 19
    * vigintile probabilities, with the z values as 16-digit LITERALS:
    * empirical quantiles by exact rank selection, theoretical =
    * μ + z·σ (6dp). The straight-line eyeball test, engine-exact.
    *
    * 100 TB shape: |days| rank window + one moment agg; the 19-row z
    * table broadcasts. */
  val qQqNormal: Q = (s, d) => {
    import s.implicits._
    val zs = Seq(
      (1, -1.6448536269514722E0), (2, -1.2815515655446004E0), (3, -1.0364333894937898E0),
      (4, -0.8416212335729143E0), (5, -0.6744897501960817E0), (6, -0.5244005127080407E0),
      (7, -0.38532046640756773E0), (8, -0.2533471031357997E0), (9, -0.12566134685507402E0),
      (10, 0.0), (11, 0.12566134685507402E0), (12, 0.2533471031357997E0),
      (13, 0.38532046640756773E0), (14, 0.5244005127080407E0), (15, 0.6744897501960817E0),
      (16, 0.8416212335729143E0), (17, 1.0364333894937898E0), (18, 1.2815515655446004E0),
      (19, 1.6448536269514722E0)).toDF("step", "z")
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val wr = Window.orderBy("x")
    val ranked = daily.withColumn("rn", row_number().over(wr))
    val n1 = daily.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
    val emp = ranked.join(broadcast(n1.select("n")))
      .join(broadcast(zs), expr("rn = (step * n + 19) div 20"))
      .groupBy("step").agg(min("x").as("empirical_c"), min("z").as("z"))
    emp.join(broadcast(n1))
      .select(col("step").cast("long").as("step"), col("empirical_c"),
        expr("""CAST(round(CAST(sx AS DOUBLE) / n
                + z * sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
                           / (n - 1)), 6) AS DOUBLE)""").as("theoretical_c"))
      .orderBy("step")
  }

  /** Western Electric run rules on the daily-revenue XmR chart: rule 1
    * (point beyond ±3σ̂), rule 2 (2 of 3 beyond ±2σ̂ same side), rule 3
    * (4 of 5 beyond ±1σ̂ same side), rule 4 (8 in a row same side of
    * center) — σ̂ = mR̄/1.128 held as the exact rational mR̄·1000/1128.
    * Violation counts per rule, all integer (zone tests are
    * cross-multiplied cents — no division anywhere).
    *
    * 100 TB shape: |days| frame; rules are fixed-width windows. */
  val qWeRules: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val wd = Window.orderBy("day")
    val mr = daily.withColumn("prev", lag("x", 1).over(wd))
      .withColumn("mr", abs(col("x") - col("prev")))
    val lims = mr.agg(sum("x").as("sx"), count(lit(1)).as("n"),
      sum("mr").as("smr"), count("mr").as("nmr"))
    // zone tests on cents scaled by 1128·nmr·n: x vs x̄ ± k·(mR̄/1.128)
    // ⇔ (x·n − sx)·1128·nmr vs ±k·1000·smr·n  — all exact int64-safe at
    // test SFs, DECIMAL beyond (documented)
    val z = daily.join(broadcast(lims))
      .withColumn("dev", expr(
        "(CAST(x AS DECIMAL(38,0)) * n - sx) * 1128 * nmr"))
      .withColumn("unit", expr("CAST(1000 AS DECIMAL(38,0)) * smr * n"))
      .withColumn("side", expr("CASE WHEN dev >= 0 THEN 1 ELSE -1 END"))
      .withColumn("z3", (abs(col("dev")) > col("unit") * 3).cast("int"))
      .withColumn("z2", (abs(col("dev")) > col("unit") * 2).cast("int"))
      .withColumn("z1", (abs(col("dev")) > col("unit")).cast("int"))
    val w3 = Window.orderBy("day").rowsBetween(-2, 0)
    val w5 = Window.orderBy("day").rowsBetween(-4, 0)
    val w8 = Window.orderBy("day").rowsBetween(-7, 0)
    z.select(
        col("z3").cast("long").as("r1"),
        ((sum(expr("CASE WHEN z2 = 1 AND side = 1 THEN 1 ELSE 0 END")).over(w3) >= 2) ||
         (sum(expr("CASE WHEN z2 = 1 AND side = -1 THEN 1 ELSE 0 END")).over(w3) >= 2))
          .cast("long").as("r2"),
        ((sum(expr("CASE WHEN z1 = 1 AND side = 1 THEN 1 ELSE 0 END")).over(w5) >= 4) ||
         (sum(expr("CASE WHEN z1 = 1 AND side = -1 THEN 1 ELSE 0 END")).over(w5) >= 4))
          .cast("long").as("r3"),
        (abs(sum("side").over(w8)) === 8).cast("long").as("r4"),
        count(lit(1)).over(w8).as("wlen"))
      .agg(sum("r1").as("rule1_points"),
        sum("r2").as("rule2_windows"),
        sum("r3").as("rule3_windows"),
        sum(expr("CASE WHEN wlen = 8 THEN r4 ELSE 0 END")).as("rule4_windows"))
  }

  /** Lo–MacKinlay variance ratio VR(5) of daily log-free revenue
    * CHANGES (plain differences — no logs needed for the additive
    * form): VR = Var(5-day diffs)/(5·Var(1-day diffs)) from exact
    * integer diff moments over the aligned interior, 6dp. VR≈1 is a
    * random walk; <1 mean reversion; >1 trending.
    *
    * 100 TB shape: two lag windows + two moment aggs over |days|. */
  val qVarianceRatio: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val w = Window.orderBy("day")
    val diffs = daily
      .withColumn("d1", col("x") - lag("x", 1).over(w))
      .withColumn("d5", col("x") - lag("x", 5).over(w))
      .filter(col("d5").isNotNull)
      .select(col("d1").cast("decimal(38,0)").as("d1"),
        col("d5").cast("decimal(38,0)").as("d5"))
    diffs.agg(count(lit(1)).as("n"),
        sum("d1").as("s1"), sum(col("d1") * col("d1")).as("s11"),
        sum("d5").as("s5"), sum(col("d5") * col("d5")).as("s55"))
      .select(col("n"),
        expr("""CAST(round(
                ((CAST(s55 AS DOUBLE) - CAST(s5 AS DOUBLE) * (CAST(s5 AS DOUBLE) / n)) / (n - 1))
                / (5 * ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n)) / (n - 1))),
                6) AS DOUBLE)""").as("vr5"))
  }

  /** Turning-point test of randomness on daily revenue: count local
    * extrema T (both neighbors on the same side), compare with the
    * i.i.d. expectation 2(n−2)/3 and variance (16n−29)/90 — the z
    * readout's only irrationality is one sqrt. Counts and the
    * expectation numerators are exact integers.
    *
    * 100 TB shape: one lag/lead window over |days|, one agg. */
  val qTurningPoints: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val w = Window.orderBy("day")
    val t = daily
      .withColumn("p", lag("x", 1).over(w))
      .withColumn("f", lead("x", 1).over(w))
      .filter(col("p").isNotNull && col("f").isNotNull)
      .select(((col("x") > col("p") && col("x") > col("f")) ||
        (col("x") < col("p") && col("x") < col("f"))).cast("long").as("tp"))
    val n1 = daily.agg(count(lit(1)).as("n"))
    t.agg(sum("tp").as("t_count")).join(broadcast(n1))
      .select(col("n"), col("t_count"),
        expr("CAST((2 * (n - 2) * 1000000) div 3 AS BIGINT)").as("expected_micro3"),
        expr("""CAST(round((t_count - 2.0 * (n - 2) / 3)
                / sqrt((16.0 * n - 29) / 90), 6) AS DOUBLE)""").as("z_stat"))
  }

  val all: Map[String, Q] = Map(
    "q_hill_tail" -> qHillTail,
    "q_qq_normal" -> qQqNormal,
    "q_we_rules" -> qWeRules,
    "q_variance_ratio" -> qVarianceRatio,
    "q_turning_points" -> qTurningPoints,
  )

  val oracles: Map[String, String] = Map(
    "q_hill_tail" ->
      """WITH top AS (
        | SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        | FROM orders ORDER BY pc DESC LIMIT 101),
        |xk AS (SELECT min(pc) AS x_ref FROM top),
        |t100 AS (SELECT pc FROM top ORDER BY pc DESC LIMIT 100),
        |ls AS (
        | SELECT CAST(round(ln(CAST(pc AS DOUBLE) / x_ref) * 1000000) AS BIGINT)
        |   AS l
        | FROM t100, xk)
        |SELECT count(*) AS k, CAST(sum(l) AS BIGINT) AS sum_ln_micro,
        | CAST((count(*) * 1000000 * 1000000) // CAST(sum(l) AS BIGINT) AS BIGINT)
        |   AS alpha_ppm
        |FROM ls""".stripMargin,
    "q_qq_normal" ->
      """WITH zs AS (
        | SELECT * FROM (VALUES
        |  (1, -1.6448536269514722E0), (2, -1.2815515655446004E0),
        |  (3, -1.0364333894937898E0), (4, -0.8416212335729143E0),
        |  (5, -0.6744897501960817E0), (6, -0.5244005127080407E0),
        |  (7, -0.38532046640756773E0), (8, -0.2533471031357997E0),
        |  (9, -0.12566134685507402E0), (10, 0.0), (11, 0.12566134685507402E0),
        |  (12, 0.2533471031357997E0), (13, 0.38532046640756773E0),
        |  (14, 0.5244005127080407E0), (15, 0.6744897501960817E0),
        |  (16, 0.8416212335729143E0), (17, 1.0364333894937898E0),
        |  (18, 1.2815515655446004E0), (19, 1.6448536269514722E0)) AS t(step, z)),
        |daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |ranked AS (
        | SELECT x, row_number() OVER (ORDER BY x) AS rn FROM daily),
        |m AS (
        | SELECT count(*) AS n, CAST(sum(x) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        | FROM daily),
        |emp AS (
        | SELECT step, min(x) AS empirical_c, min(z) AS z
        | FROM ranked, m, zs WHERE rn = (step * n + 19) // 20
        | GROUP BY step)
        |SELECT CAST(step AS BIGINT) AS step, empirical_c,
        | CAST(round(CAST(sx AS DOUBLE) / n
        |   + z * sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
        |              / (n - 1)), 6) AS DOUBLE) AS theoretical_c
        |FROM emp, m ORDER BY step""".stripMargin,
    "q_we_rules" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |mr AS (
        | SELECT day, x, abs(x - lag(x) OVER (ORDER BY day)) AS mr FROM daily),
        |lims AS (
        | SELECT CAST(sum(x) AS HUGEINT) AS sx, count(*) AS n,
        |   CAST(sum(mr) AS HUGEINT) AS smr, count(mr) AS nmr
        | FROM mr),
        |z AS (
        | SELECT day,
        |  (CAST(x AS HUGEINT) * n - sx) * 1128 * nmr AS dev,
        |  CAST(1000 AS HUGEINT) * smr * n AS unit,
        |  CASE WHEN (CAST(x AS HUGEINT) * n - sx) >= 0 THEN 1 ELSE -1 END AS side
        | FROM daily, lims),
        |f AS (
        | SELECT day, side,
        |  CASE WHEN abs(dev) > unit * 3 THEN 1 ELSE 0 END AS z3,
        |  CASE WHEN abs(dev) > unit * 2 THEN 1 ELSE 0 END AS z2,
        |  CASE WHEN abs(dev) > unit THEN 1 ELSE 0 END AS z1
        | FROM z),
        |wind AS (
        | SELECT z3 AS r1,
        |  CASE WHEN sum(CASE WHEN z2 = 1 AND side = 1 THEN 1 ELSE 0 END)
        |    OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
        |   OR sum(CASE WHEN z2 = 1 AND side = -1 THEN 1 ELSE 0 END)
        |    OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
        |   THEN 1 ELSE 0 END AS r2,
        |  CASE WHEN sum(CASE WHEN z1 = 1 AND side = 1 THEN 1 ELSE 0 END)
        |    OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4
        |   OR sum(CASE WHEN z1 = 1 AND side = -1 THEN 1 ELSE 0 END)
        |    OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4
        |   THEN 1 ELSE 0 END AS r3,
        |  CASE WHEN abs(sum(side)
        |    OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) = 8
        |   THEN 1 ELSE 0 END AS r4,
        |  count(*) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
        |    AS wlen
        | FROM f)
        |SELECT CAST(sum(r1) AS BIGINT) AS rule1_points,
        | CAST(sum(r2) AS BIGINT) AS rule2_windows,
        | CAST(sum(r3) AS BIGINT) AS rule3_windows,
        | CAST(sum(CASE WHEN wlen = 8 THEN r4 ELSE 0 END) AS BIGINT)
        |   AS rule4_windows
        |FROM wind""".stripMargin,
    "q_variance_ratio" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |diffs AS (
        | SELECT CAST(x - lag(x, 1) OVER (ORDER BY day) AS HUGEINT) AS d1,
        |   CAST(x - lag(x, 5) OVER (ORDER BY day) AS HUGEINT) AS d5
        | FROM daily QUALIFY d5 IS NOT NULL),
        |m AS (
        | SELECT count(*) AS n,
        |  CAST(sum(d1) AS HUGEINT) AS s1, CAST(sum(d1 * d1) AS HUGEINT) AS s11,
        |  CAST(sum(d5) AS HUGEINT) AS s5, CAST(sum(d5 * d5) AS HUGEINT) AS s55
        | FROM diffs)
        |SELECT n,
        | CAST(round(
        |  ((CAST(s55 AS DOUBLE) - CAST(s5 AS DOUBLE) * (CAST(s5 AS DOUBLE) / n)) / (n - 1))
        |  / (5 * ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n)) / (n - 1))),
        |  6) AS DOUBLE) AS vr5
        |FROM m""".stripMargin,
    "q_turning_points" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |t AS (
        | SELECT CASE WHEN (x > p AND x > f) OR (x < p AND x < f)
        |   THEN 1 ELSE 0 END AS tp
        | FROM (SELECT x, lag(x) OVER (ORDER BY day) AS p,
        |         lead(x) OVER (ORDER BY day) AS f FROM daily) q
        | WHERE p IS NOT NULL AND f IS NOT NULL),
        |n_ AS (SELECT count(*) AS n FROM daily)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sum(tp) AS BIGINT) AS t_count,
        | CAST((2 * (n - 2) * 1000000) // 3 AS BIGINT) AS expected_micro3,
        | CAST(round((sum(tp) - 2.0 * (n - 2) / 3) / sqrt((16.0 * n - 29) / 90), 6)
        |   AS DOUBLE) AS z_stat
        |FROM t, n_ GROUP BY n""".stripMargin,
  )
}
