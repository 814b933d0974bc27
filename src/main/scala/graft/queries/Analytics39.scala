package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 21: agreement, index numbers, and capability — Kendall's W
  * (with the Friedman χ² rider), the Laspeyres/Paasche/Fisher price
  * index triple, a process-capability readout, and seasonal strength.
  * Ranks and index numerators are exact integers (floor-div receipts
  * documented); Fisher's √(L·P) is the only sqrt, on a 1-row frame.
  */
object Analytics39 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Kendall's coefficient of concordance W across the five
    * top-revenue nations ranking the 12 calendar months by their
    * revenue (2×-avg-rank integers; ties textbook-averaged), plus
    * Friedman's χ² = k(n−1)·W as an exact integer-µ rider:
    * W_µ = 3·S₄·10⁶ div (k²(n³−n)) with S₄ = Σ(R2ᵢ − k(n+1))².
    *
    * 100 TB shape: fact → (nation × month) census → per-nation rank
    * windows over 12 rows each; everything after is a 12-row frame. */
  val qKendallW: Q = (s, d) => {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"),
        month(col("o_orderdate").cast("date")).cast("long").as("m"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
    val topK = rev.groupBy("nk").agg(sum("v").as("tot"))
      .orderBy(col("tot").desc, col("nk")).limit(5).select("nk")
    // densify to a complete block design: every (rater, month) cell
    // exists, zero-revenue months rank lowest (tied) — W stays defined
    // at tiny SFs where a nation may skip a month
    val months = rev.select("m").distinct()
    val cells = months.crossJoin(broadcast(topK))
      .join(rev, Seq("nk", "m"), "left")
      .withColumn("v", coalesce(col("v"), lit(0L)))
    val wr = Window.partitionBy("nk").orderBy("v")
    val wt = Window.partitionBy("nk", "v")
    val ranked = cells
      .withColumn("r2", rank().over(wr).cast("long") * 2
        + count(lit(1)).over(wt) - 1)
    val sums = ranked.groupBy("m").agg(sum("r2").as("rsum2"))
    val kn = ranked.agg(countDistinct("nk").as("k"), countDistinct("m").as("n"))
    sums.join(broadcast(kn))
      .agg(max("k").as("k_raters"), max("n").as("n_items"),
        sum(expr(
          """CAST(rsum2 - k * (n + 1) AS DECIMAL(38,0))
             * (rsum2 - k * (n + 1))""")).as("s4"))
      .select(col("k_raters"), col("n_items"),
        expr("""CAST((3 * s4 * 1000000)
                div (CAST(k_raters AS DECIMAL(38,0)) * k_raters
                     * (CAST(n_items AS DECIMAL(38,0)) * n_items * n_items - n_items))
                AS BIGINT)""").as("w_ppm"))
      .withColumn("friedman_chi2_micro",
        expr("k_raters * (n_items - 1) * w_ppm"))
  }

  /** Laspeyres / Paasche / Fisher price indices for 1995→1996 over the
    * parts trading in both years: denominator Σp₀q₀ and numerator
    * Σp₁q₁ are EXACT revenue cents; the cross terms Σp₁q₀ and Σp₀q₁
    * floor once per part in micro-cents (receipts documented).
    * Fisher = √(L·P) on the 1-row frame, 6dp... kept in ppm like its
    * factors.
    *
    * 100 TB shape: one (part × year) partial agg; the index arithmetic
    * is part-keyed narrow work + one 1-row readout. */
  val qPriceIndex: Q = (s, d) => {
    val py = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(expr("year(CAST(o_orderdate AS DATE)) IN (1995, 1996)"))
      .groupBy(col("l_partkey").as("pk"),
        expr("year(CAST(o_orderdate AS DATE))").as("yr"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
    val w = py.filter(col("yr") === 1995)
      .select(col("pk"), col("rev").as("rev0"), col("qty").as("q0"))
      .join(py.filter(col("yr") === 1996)
        .select(col("pk"), col("rev").as("rev1"), col("qty").as("q1")), "pk")
    w.agg(
        count(lit(1)).as("n_parts"),
        sum("rev0").as("d_l"), sum("rev1").as("n_p"),
        sum(expr("(CAST(rev1 AS DECIMAL(38,0)) * q0 * 1000000) div q1")).as("n_l_mc"),
        sum(expr("(CAST(rev0 AS DECIMAL(38,0)) * q1 * 1000000) div q0")).as("d_p_mc"))
      .select(col("n_parts"),
        expr("CAST(n_l_mc div d_l AS BIGINT)").as("laspeyres_ppm"),
        expr("CAST((CAST(n_p AS DECIMAL(38,0)) * 1000000000000) div d_p_mc AS BIGINT)")
          .as("paasche_ppm"))
      .withColumn("fisher_ppm", expr(
        """CAST(round(sqrt(CAST(laspeyres_ppm AS DOUBLE) * paasche_ppm)) AS BIGINT)"""))
  }

  /** Process capability of daily revenue against rank-selected p05/p95
    * spec limits (the self-calibrated variant — external USL/LSL slot
    * in trivially): Cp = (USL−LSL)/6σ and Cpk = min(USL−μ, μ−LSL)/3σ,
    * 6dp one-row readouts from exact moments + exact rank-selected
    * limits.
    *
    * 100 TB shape: |days| frame; one rank window + one moment agg. */
  val qCpk: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val wr = Window.orderBy("x")
    val ranked = daily.withColumn("rn", row_number().over(wr))
    val n1 = daily.agg(count(lit(1)).as("n"))
    val lims = ranked.join(broadcast(n1))
      .filter(col("rn") === expr("(n + 19) div 20") ||
        col("rn") === expr("(19 * n + 19) div 20"))
      .agg(min("x").as("lsl"), max("x").as("usl"))
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
    val sd = "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n)) / (n - 1))"
    m.join(broadcast(lims))
      .select(col("n").as("n_days"),
        expr("CAST(lsl AS BIGINT)").as("lsl_c"), expr("CAST(usl AS BIGINT)").as("usl_c"),
        expr(s"CAST(round((usl - lsl) / (6 * $sd), 6) AS DOUBLE)").as("cp"),
        expr(s"""CAST(round(least(usl - CAST(sx AS DOUBLE) / n,
                CAST(sx AS DOUBLE) / n - lsl) / (3 * $sd), 6) AS DOUBLE)""").as("cpk"))
  }

  /** Seasonal strength F_s = max(0, 1 − Var(residual)/Var(detrended))
    * (Hyndman's STL readout) over the q_seasonal_decompose pipeline —
    * how much of the detrended variance the weekly pattern explains.
    * Variances from exact integer moments of the interior days; 6dp.
    *
    * 100 TB shape: same bounded-frame pipeline as the decomposition,
    * plus one moment agg. */
  val qSeasonalStrength: Q = (s, d) => {
    val dec = Analytics30.qSeasonalDecompose(s, d)
      .filter(col("residual_c").isNotNull)
      .select(col("residual_c").cast("decimal(38,0)").as("r"),
        (col("rev_c") - col("trend_c")).cast("decimal(38,0)").as("dt"))
    dec.agg(count(lit(1)).as("n"),
        sum("r").as("sr"), sum(col("r") * col("r")).as("srr"),
        sum("dt").as("sd_"), sum(col("dt") * col("dt")).as("sdd"))
      .select(col("n").as("n_days"),
        expr("""CAST(round(greatest(CAST(0 AS DOUBLE),
                1 - (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * (CAST(sr AS DOUBLE) / n))
                  / (CAST(sdd AS DOUBLE) - CAST(sd_ AS DOUBLE) * (CAST(sd_ AS DOUBLE) / n))), 6)
                AS DOUBLE)""").as("seasonal_strength"))
  }

  val all: Map[String, Q] = Map(
    "q_kendall_w" -> qKendallW,
    "q_price_index" -> qPriceIndex,
    "q_cpk" -> qCpk,
    "q_seasonal_strength" -> qSeasonalStrength,
  )

  val oracles: Map[String, String] = Map(
    "q_kendall_w" ->
      """WITH rev AS (
        | SELECT c_nationkey AS nk,
        |   CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1, 2),
        |topk AS (
        | SELECT nk FROM rev GROUP BY nk
        | ORDER BY sum(v) DESC, nk LIMIT 5),
        |months AS (SELECT DISTINCT m FROM rev),
        |cells AS (
        | SELECT t.nk, months.m, coalesce(rev.v, 0) AS v
        | FROM months CROSS JOIN topk t
        | LEFT JOIN rev ON rev.nk = t.nk AND rev.m = months.m),
        |ranked AS (
        | SELECT nk, m,
        |   rank() OVER (PARTITION BY nk ORDER BY v) * 2
        |   + count(*) OVER (PARTITION BY nk, v) - 1 AS r2
        | FROM cells),
        |sums AS (SELECT m, CAST(sum(r2) AS BIGINT) AS rsum2 FROM ranked GROUP BY m),
        |kn AS (
        | SELECT count(DISTINCT nk) AS k, count(DISTINCT m) AS n FROM ranked),
        |agg AS (
        | SELECT any_value(k) AS k_raters, any_value(n) AS n_items,
        |  CAST(sum(CAST(rsum2 - k * (n + 1) AS HUGEINT)
        |    * (rsum2 - k * (n + 1))) AS HUGEINT) AS s4
        | FROM sums, kn)
        |SELECT CAST(k_raters AS BIGINT) AS k_raters,
        | CAST(n_items AS BIGINT) AS n_items,
        | CAST((3 * s4 * 1000000)
        |  // (CAST(k_raters AS HUGEINT) * k_raters
        |     * (CAST(n_items AS HUGEINT) * n_items * n_items - n_items)) AS BIGINT)
        |   AS w_ppm,
        | CAST(k_raters * (n_items - 1)
        |  * ((3 * s4 * 1000000)
        |     // (CAST(k_raters AS HUGEINT) * k_raters
        |        * (CAST(n_items AS HUGEINT) * n_items * n_items - n_items)))
        |   AS BIGINT) AS friedman_chi2_micro
        |FROM agg""".stripMargin,
    "q_price_index" ->
      """WITH py AS (
        | SELECT l_partkey AS pk, year(CAST(o_orderdate AS DATE)) AS yr,
        |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
        |   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        | GROUP BY 1, 2),
        |w AS (
        | SELECT a.pk, a.rev AS rev0, a.qty AS q0, b.rev AS rev1, b.qty AS q1
        | FROM (SELECT * FROM py WHERE yr = 1995) a
        | JOIN (SELECT * FROM py WHERE yr = 1996) b USING (pk)),
        |agg AS (
        | SELECT count(*) AS n_parts,
        |  CAST(sum(rev0) AS HUGEINT) AS d_l, CAST(sum(rev1) AS HUGEINT) AS n_p,
        |  CAST(sum((CAST(rev1 AS HUGEINT) * q0 * 1000000) // q1) AS HUGEINT)
        |    AS n_l_mc,
        |  CAST(sum((CAST(rev0 AS HUGEINT) * q1 * 1000000) // q0) AS HUGEINT)
        |    AS d_p_mc
        | FROM w)
        |SELECT n_parts,
        | CAST(n_l_mc // d_l AS BIGINT) AS laspeyres_ppm,
        | CAST((n_p * 1000000000000) // d_p_mc AS BIGINT) AS paasche_ppm,
        | CAST(round(sqrt(CAST(n_l_mc // d_l AS DOUBLE)
        |   * CAST((n_p * 1000000000000) // d_p_mc AS BIGINT))) AS BIGINT)
        |   AS fisher_ppm
        |FROM agg""".stripMargin,
    "q_cpk" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |ranked AS (
        | SELECT x, row_number() OVER (ORDER BY x) AS rn,
        |   count(*) OVER () AS n
        | FROM daily),
        |lims AS (
        | SELECT min(x) AS lsl, max(x) AS usl FROM ranked
        | WHERE rn = (n + 19) // 20 OR rn = (19 * n + 19) // 20),
        |m AS (
        | SELECT count(*) AS n, CAST(sum(x) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        | FROM daily)
        |SELECT n AS n_days, lsl AS lsl_c, usl AS usl_c,
        | CAST(round((usl - lsl)
        |   / (6 * sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n)) / (n - 1))), 6)
        |   AS DOUBLE) AS cp,
        | CAST(round(least(usl - CAST(sx AS DOUBLE) / n, CAST(sx AS DOUBLE) / n - lsl)
        |   / (3 * sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n)) / (n - 1))), 6)
        |   AS DOUBLE) AS cpk
        |FROM m, lims""".stripMargin,
    "q_seasonal_strength" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c,
        |   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS i
        | FROM orders GROUP BY 1, 3),
        |tr AS (
        | SELECT day, rev_c, i,
        |   sum(rev_c) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |     AS wsum,
        |   count(*) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |     AS wcnt
        | FROM daily),
        |trended AS (
        | SELECT day, rev_c, i % 7 AS dow,
        |   CASE WHEN wcnt = 7 THEN wsum // 7 END AS trend_c,
        |   rev_c - (CASE WHEN wcnt = 7 THEN wsum // 7 END) AS det
        | FROM tr),
        |seas AS (
        | SELECT dow, sum(det) // count(*) AS seasonal_c
        | FROM trended WHERE det IS NOT NULL GROUP BY dow),
        |resid AS (
        | SELECT CAST(t.det AS HUGEINT) AS dt,
        |   CAST(t.det - s.seasonal_c AS HUGEINT) AS r
        | FROM trended t JOIN seas s ON t.dow = s.dow
        | WHERE t.det IS NOT NULL),
        |m AS (
        | SELECT count(*) AS n, CAST(sum(r) AS HUGEINT) AS sr,
        |  CAST(sum(r * r) AS HUGEINT) AS srr,
        |  CAST(sum(dt) AS HUGEINT) AS sd_, CAST(sum(dt * dt) AS HUGEINT) AS sdd
        | FROM resid)
        |SELECT n AS n_days,
        | CAST(round(greatest(CAST(0 AS DOUBLE),
        |   1 - (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * (CAST(sr AS DOUBLE) / n))
        |     / (CAST(sdd AS DOUBLE) - CAST(sd_ AS DOUBLE) * (CAST(sd_ AS DOUBLE) / n))), 6)
        |   AS DOUBLE) AS seasonal_strength
        |FROM m""".stripMargin,
  )
}
