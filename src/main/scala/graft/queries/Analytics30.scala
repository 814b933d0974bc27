package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 12: the classical testing/SPC layer — one-way ANOVA,
  * Brown–Forsythe, two-sample Cramér–von Mises, additive seasonal
  * decomposition, partial correlation, and an XmR control chart.
  * Disciplines as established: exact integer/decimal moments
  * everywhere, census-based rank arithmetic (never a row-level global
  * window), floor-div receipts documented, and final readouts either
  * pure integers or one-row doubles built from exact inputs with
  * IEEE-exact ops in oracle-identical textual order (the q_spearman
  * byte-identity argument — sqrt is correctly rounded by IEEE-754, so
  * it is as safe as +,−,×,/; no libm transcendentals anywhere).
  */
object Analytics30 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** One-way ANOVA of price cents across the five order priorities —
    * the parametric sibling of [[Analytics29.qKruskalWallis]]. Sums of
    * squares come from exact DECIMAL(38,0) moments with the
    * remainder-subtracted exact division ((a−a%b)/b — Spark's `div`
    * returns int64, too narrow for (Σx)²/n at sf0.1):
    *   SSB = Σⱼ(Σxⱼ)²/nⱼ − (Σx)²/N,  SSW = Σx² − Σⱼ(Σxⱼ)²/nⱼ
    * floored once per term (receipt ≤ 1 cent² each, documented). F and
    * η² read out from those integers: F as a one-row double ratio,
    * η² as exact integer ppm.
    *
    * 100 TB shape: ONE partial-aggregable moment pass over the scan to
    * 5 rows; everything after is driver-sized. */
  val qAnovaOneway: Q = (s, d) => {
    val m = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))").as("pc"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_g"), sum("pc").as("sx"),
        sum(col("pc") * col("pc")).as("sxx"))
      .withColumn("num", expr("sx * sx"))
      .withColumn("gterm", expr("CAST((num - num % n_g) / n_g AS DECIMAL(38,0))"))
    m.agg(
        sum("n_g").as("n"), count(lit(1)).as("k"),
        sum("sx").as("tsx"), sum("sxx").as("tsxx"), sum("gterm").as("gsum"))
      .withColumn("tnum", expr("tsx * tsx"))
      .withColumn("ssb", expr("gsum - CAST((tnum - tnum % n) / n AS DECIMAL(38,0))"))
      .withColumn("ssw", expr("tsxx - gsum"))
      .select(col("n"), col("k"),
        expr("""CAST(round((CAST(ssb AS DOUBLE) / (k - 1))
                / (CAST(ssw AS DOUBLE) / (n - k)), 6) AS DOUBLE)""").as("f_stat"),
        expr("CAST((ssb * 1000000) div (ssb + ssw) AS BIGINT)").as("eta2_ppm"))
  }

  /** Brown–Forsythe homogeneity-of-variance test: one-way ANOVA on
    * |x − medianⱼ|, the median-centered (robust) Levene variant. Group
    * medians are exact data values by rank selection (lower median at
    * rank (n+1) div 2 — the q_percentile_disc discipline), so the
    * absolute deviations are exact integer cents and the second-stage
    * moments are DECIMAL(38,0)-exact; W reads out as the same one-row
    * double ratio as [[qAnovaOneway]].
    *
    * 100 TB shape: median per group from the per-group VALUE CENSUS
    * (groupBy to |grp × distinct-cents| rows + one running-sum window
    * over the census — never a row-level rank window), medians
    * broadcast back over the scan, one moment pass. */
  val qLeveneBf: Q = (s, d) => {
    val vals = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"))
    val census = vals.groupBy("grp", "pc").agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy("grp").orderBy("pc")
      .rowsBetween(Window.unboundedPreceding, 0)
    val meds = census
      .withColumn("upto", sum("cnt").over(wg))
      .withColumn("n_g", sum("cnt").over(Window.partitionBy("grp")))
      .filter(col("upto") >= expr("(n_g + 1) div 2"))
      .groupBy("grp").agg(min("pc").as("med"))
    val z = vals.join(broadcast(meds), "grp")
      .select(col("grp"),
        expr("CAST(abs(pc - med) AS DECIMAL(38,0))").as("z"))
    val m = z.groupBy("grp")
      .agg(count(lit(1)).as("n_g"), sum("z").as("sx"),
        sum(col("z") * col("z")).as("sxx"))
      .withColumn("num", expr("sx * sx"))
      .withColumn("gterm", expr("CAST((num - num % n_g) / n_g AS DECIMAL(38,0))"))
    m.agg(
        sum("n_g").as("n"), count(lit(1)).as("k"),
        sum("sx").as("tsx"), sum("sxx").as("tsxx"), sum("gterm").as("gsum"))
      .withColumn("tnum", expr("tsx * tsx"))
      .withColumn("ssb", expr("gsum - CAST((tnum - tnum % n) / n AS DECIMAL(38,0))"))
      .withColumn("ssw", expr("tsxx - gsum"))
      .select(col("n"), col("k"),
        expr("""CAST(round((CAST(ssb AS DOUBLE) / (k - 1))
                / (CAST(ssw AS DOUBLE) / (n - k)), 6) AS DOUBLE)""").as("w_stat"))
  }

  /** Two-sample Cramér–von Mises (Anderson 1962 rank form) between
    * returned ('R') and accepted ('A') line items on price cents:
    *   T = U/(nmN) − (4nm−1)/(6N),
    *   U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)²
    * with the deterministic value-then-sample tie order (A before R
    * within a price). Under that order (rᵢ−i) is CONSTANT across a
    * tie run — for an A row at price v it is the count of R rows at
    * smaller prices — so U collapses onto the VALUE CENSUS:
    *   U = n·Σᵥ cA(v)·Rbefore(v)² + m·Σᵥ cR(v)·(Aupto(v))²
    * — no row-level rank is ever materialized. T in exact micro
    * units via two floor divs (receipts ≤ 1µ each).
    *
    * 100 TB shape: one groupBy to the bounded price census, two
    * running sums over it, a 1-row readout. */
  val qCvmTest: Q = (s, d) => {
    val census = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"))
      .agg(sum((col("l_returnflag") === "A").cast("long")).as("ca"),
        sum((col("l_returnflag") === "R").cast("long")).as("cr"))
    val wv = Window.orderBy("pc").rowsBetween(Window.unboundedPreceding, -1)
    val cum = census
      .withColumn("a_before", coalesce(sum("ca").over(wv), lit(0L)))
      .withColumn("r_before", coalesce(sum("cr").over(wv), lit(0L)))
    cum.agg(
        sum("ca").as("n"), sum("cr").as("m"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * r_before * r_before")).as("ua"),
        sum(expr("CAST(cr AS DECIMAL(38,0)) * (a_before + ca) * (a_before + ca)"))
          .as("ur"))
      .withColumn("u", expr("CAST(n AS DECIMAL(38,0)) * ua + CAST(m AS DECIMAL(38,0)) * ur"))
      .select(col("n"), col("m"),
        expr("""CAST((u * 1000000) div (CAST(n AS DECIMAL(38,0)) * m * (n + m))
                - ((4 * CAST(n AS DECIMAL(38,0)) * m - 1) * 1000000)
                  div (6 * (CAST(n AS DECIMAL(38,0)) + m)) AS BIGINT)""")
          .as("t_micro"))
  }

  /** Additive seasonal decomposition of daily revenue: trend =
    * centered 7-day moving average (full windows only — edges stay
    * null), weekly seasonal = per-day-of-week floor-mean of the
    * detrended series, residual = the rest. All integer cents with
    * trunc-div receipts (negative numerators truncate identically in
    * both engines — adjudicated in r9's negative-division note).
    * Day-of-week is (days-since-epoch) % 7 — engine-neutral, unlike
    * dayofweek()'s Sunday-origin disagreement.
    *
    * 100 TB shape: the fact collapses to the bounded |days| frame
    * first; both windows and the dow census run over ≤2.4k rows. */
  val qSeasonalDecompose: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .withColumn("i", expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT)"))
    val w7 = Window.orderBy("i").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("wsum", sum("rev_c").over(w7))
      .withColumn("wcnt", count(lit(1)).over(w7))
      .withColumn("trend_c",
        when(col("wcnt") === 7, expr("wsum div 7")))
      .withColumn("dow", expr("i % 7"))
      .withColumn("det", col("rev_c") - col("trend_c"))
    val seas = trended.filter(col("det").isNotNull)
      .groupBy("dow").agg(expr("sum(det) div count(1)").as("seasonal_c"))
    trended.join(broadcast(seas), Seq("dow"), "left")
      .select(col("day").cast("string").as("day"), col("rev_c"),
        col("trend_c"), col("dow"), col("seasonal_c"),
        (col("rev_c") - col("trend_c") - col("seasonal_c")).as("residual_c"))
      .orderBy("day")
  }

  /** Partial correlation of quantity and price given discount, per
    * return flag — does the qty↔price association survive controlling
    * for the discount tier?
    *   ρ_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²))
    * from the nine DECIMAL(38,0)-exact integer moments (qty units,
    * price cents, discount in exact hundredths), each pairwise r and
    * the final composition evaluated in oracle-identical double op
    * order, 6dp round.
    *
    * 100 TB shape: ONE partial-aggregable 10-moment pass (the
    * q_corr_matrix shape) to 3 rows. */
  val qPartialCorr: Q = (s, d) => {
    // fan out the few-split scan (r16): the 10-moment DECIMAL(38,0)
    // product pass is the repo's most CPU-expensive per-row agg and ran
    // in one 3-task job (measured 1.9 s of the query's 2.4 s at sf0.1);
    // project to the 4 needed columns first so the exchange is narrow
    val li = graft.operators.Scale.fanOutScan(Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      expr("CAST(CAST(round(l_quantity) AS BIGINT) AS DECIMAL(38,0))").as("x"),
      expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))").as("y"),
      expr("CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))").as("z")))
    val m = li.groupBy("flag").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("z")).as("sxz"),
      sum(col("y") * col("z")).as("syz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"))
    val rxy = "((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
    val rxz = "((n * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * sqrt(n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))))"
    val ryz = "((n * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE)) / (sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) * sqrt(n * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))))"
    m.select(col("flag"), col("n"),
        expr(s"CAST(round($rxy, 6) AS DOUBLE)").as("r_xy"),
        expr(s"CAST(round(($rxy - $rxz * $ryz) / (sqrt(1 - $rxz * $rxz) * sqrt(1 - $ryz * $ryz)), 6) AS DOUBLE)")
          .as("r_xy_given_z"))
      .orderBy("flag")
  }

  /** XmR (individuals & moving range) control chart over daily
    * revenue: center = floor-mean, limits = x̄ ± 2.66·mR̄ with the
    * Shewhart constant held as the exact rational 2660/1000 — so the
    * whole chart is integer cents (one trunc-div per statistic,
    * receipts documented). Emits the one-row chart summary with the
    * out-of-control day counts on each side.
    *
    * 100 TB shape: fact → bounded daily frame; one lag window and two
    * scalar aggs over ≤2.4k rows; the violation count re-scans only
    * the daily frame against the broadcast 1-row limits. */
  val qControlChart: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    val wd = Window.orderBy("day")
    val mr = daily
      .withColumn("prev", lag("rev_c", 1).over(wd))
      .withColumn("mr", abs(col("rev_c") - col("prev")))
    val lims = mr.agg(
        count(lit(1)).as("n_days"),
        expr("sum(rev_c) div count(1)").as("xbar_c"),
        expr("sum(mr) div count(mr)").as("mrbar_c"))
      .withColumn("ucl_c", expr("xbar_c + (2660 * mrbar_c) div 1000"))
      .withColumn("lcl_c", expr("xbar_c - (2660 * mrbar_c) div 1000"))
    daily.join(broadcast(lims))
      .groupBy("n_days", "xbar_c", "mrbar_c", "ucl_c", "lcl_c")
      .agg(sum((col("rev_c") > col("ucl_c")).cast("long")).as("n_above"),
        sum((col("rev_c") < col("lcl_c")).cast("long")).as("n_below"))
      .select("n_days", "xbar_c", "mrbar_c", "ucl_c", "lcl_c", "n_above", "n_below")
  }

  val all: Map[String, Q] = Map(
    "q_anova_oneway" -> qAnovaOneway,
    "q_levene_bf" -> qLeveneBf,
    "q_cvm_test" -> qCvmTest,
    "q_seasonal_decompose" -> qSeasonalDecompose,
    "q_partial_corr" -> qPartialCorr,
    "q_control_chart" -> qControlChart,
  )

  private val anovaReadout =
    """SELECT n, k,
      | CAST(round((CAST(ssb AS DOUBLE) / (k - 1))
      |   / (CAST(ssw AS DOUBLE) / (n - k)), 6) AS DOUBLE) AS %s%s
      |FROM fin""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_anova_oneway" ->
      ("""WITH m AS (
        | SELECT o_orderpriority AS grp, count(*) AS n_g,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
        |     * CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS sxx
        | FROM orders GROUP BY 1),
        |g AS (SELECT n_g, sx, sxx, (sx * sx) // n_g AS gterm FROM m),
        |agg AS (
        | SELECT CAST(sum(n_g) AS HUGEINT) AS n, count(*) AS k,
        |   CAST(sum(sx) AS HUGEINT) AS tsx, CAST(sum(sxx) AS HUGEINT) AS tsxx,
        |   CAST(sum(gterm) AS HUGEINT) AS gsum
        | FROM g),
        |fin AS (
        | SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |   gsum - (tsx * tsx) // n AS ssb, tsxx - gsum AS ssw
        | FROM agg)
        |""" + anovaReadout.format("f_stat",
        ",\n CAST((ssb * 1000000) // (ssb + ssw) AS BIGINT) AS eta2_ppm")).stripMargin,
    "q_levene_bf" ->
      ("""WITH vals AS (
        | SELECT o_orderpriority AS grp,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        | FROM orders),
        |census AS (SELECT grp, pc, count(*) AS cnt FROM vals GROUP BY 1, 2),
        |cum AS (
        | SELECT grp, pc,
        |   sum(cnt) OVER (PARTITION BY grp ORDER BY pc
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS upto,
        |   sum(cnt) OVER (PARTITION BY grp) AS n_g
        | FROM census),
        |meds AS (
        | SELECT grp, min(pc) AS med FROM cum
        | WHERE upto >= (n_g + 1) // 2 GROUP BY grp),
        |z AS (
        | SELECT v.grp, CAST(abs(pc - med) AS HUGEINT) AS z
        | FROM vals v JOIN meds USING (grp)),
        |m AS (
        | SELECT grp, count(*) AS n_g, CAST(sum(z) AS HUGEINT) AS sx,
        |   CAST(sum(z * z) AS HUGEINT) AS sxx
        | FROM z GROUP BY grp),
        |g AS (SELECT n_g, sx, sxx, (sx * sx) // n_g AS gterm FROM m),
        |agg AS (
        | SELECT CAST(sum(n_g) AS HUGEINT) AS n, count(*) AS k,
        |   CAST(sum(sx) AS HUGEINT) AS tsx, CAST(sum(sxx) AS HUGEINT) AS tsxx,
        |   CAST(sum(gterm) AS HUGEINT) AS gsum
        | FROM agg0),
        |fin AS (
        | SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |   gsum - (tsx * tsx) // n AS ssb, tsxx - gsum AS ssw
        | FROM agg)
        |""" + anovaReadout.format("w_stat", "")).stripMargin
        .replace("FROM agg0", "FROM g"),
    "q_cvm_test" ->
      """WITH census AS (
        | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
        |   sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca,
        |   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cr
        | FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
        |cum AS (
        | SELECT pc, ca, cr,
        |  coalesce(sum(ca) OVER (ORDER BY pc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a_before,
        |  coalesce(sum(cr) OVER (ORDER BY pc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r_before
        | FROM census),
        |agg AS (
        | SELECT CAST(sum(ca) AS HUGEINT) AS n, CAST(sum(cr) AS HUGEINT) AS m,
        |  CAST(sum(CAST(ca AS HUGEINT) * r_before * r_before) AS HUGEINT) AS ua,
        |  CAST(sum(CAST(cr AS HUGEINT) * (a_before + ca) * (a_before + ca))
        |    AS HUGEINT) AS ur
        | FROM cum),
        |fin AS (SELECT n, m, n * ua + m * ur AS u FROM agg)
        |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        | CAST((u * 1000000) // (n * m * (n + m))
        |   - ((4 * n * m - 1) * 1000000) // (6 * (n + m)) AS BIGINT) AS t_micro
        |FROM fin""".stripMargin,
    "q_seasonal_decompose" ->
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
        | FROM trended WHERE det IS NOT NULL GROUP BY dow)
        |SELECT CAST(day AS VARCHAR) AS day, rev_c,
        | CAST(trend_c AS BIGINT) AS trend_c, CAST(t.dow AS BIGINT) AS dow,
        | CAST(seasonal_c AS BIGINT) AS seasonal_c,
        | CAST(rev_c - trend_c - seasonal_c AS BIGINT) AS residual_c
        |FROM trended t LEFT JOIN seas s ON t.dow = s.dow
        |ORDER BY day""".stripMargin,
    "q_partial_corr" -> {
      def r(sab: String, a: String, b: String) =
        s"""((n * CAST($sab AS DOUBLE) - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE))
           | / (sqrt(n * CAST(s$a$a AS DOUBLE) - CAST(s$a AS DOUBLE) * CAST(s$a AS DOUBLE))
           |  * sqrt(n * CAST(s$b$b AS DOUBLE) - CAST(s$b AS DOUBLE) * CAST(s$b AS DOUBLE))))"""
          .stripMargin.replace("\n", " ")
      val rxy = r("sxy", "x", "y"); val rxz = r("sxz", "x", "z"); val ryz = r("syz", "y", "z")
      s"""WITH li AS (
        | SELECT l_returnflag AS flag,
        |  CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT) AS x,
        |  CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT) AS y,
        |  CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT) AS z
        | FROM lineitem),
        |m AS (
        | SELECT flag, count(*) AS n,
        |  CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |  CAST(sum(z) AS HUGEINT) AS sz,
        |  CAST(sum(x * y) AS HUGEINT) AS sxy, CAST(sum(x * z) AS HUGEINT) AS sxz,
        |  CAST(sum(y * z) AS HUGEINT) AS syz,
        |  CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(y * y) AS HUGEINT) AS syy,
        |  CAST(sum(z * z) AS HUGEINT) AS szz
        | FROM li GROUP BY flag)
        |SELECT flag, CAST(n AS BIGINT) AS n,
        | CAST(round($rxy, 6) AS DOUBLE) AS r_xy,
        | CAST(round(($rxy - $rxz * $ryz)
        |   / (sqrt(1 - $rxz * $rxz) * sqrt(1 - $ryz * $ryz)), 6) AS DOUBLE)
        |   AS r_xy_given_z
        |FROM m ORDER BY flag""".stripMargin
    },
    "q_control_chart" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |mr AS (
        | SELECT day, rev_c,
        |   abs(rev_c - lag(rev_c) OVER (ORDER BY day)) AS mr
        | FROM daily),
        |lims AS (
        | SELECT count(*) AS n_days,
        |   sum(rev_c) // count(*) AS xbar_c,
        |   sum(mr) // count(mr) AS mrbar_c
        | FROM mr),
        |lims2 AS (
        | SELECT n_days, xbar_c, mrbar_c,
        |   xbar_c + (2660 * mrbar_c) // 1000 AS ucl_c,
        |   xbar_c - (2660 * mrbar_c) // 1000 AS lcl_c
        | FROM lims)
        |SELECT CAST(n_days AS BIGINT) AS n_days, CAST(xbar_c AS BIGINT) AS xbar_c,
        | CAST(mrbar_c AS BIGINT) AS mrbar_c, CAST(ucl_c AS BIGINT) AS ucl_c,
        | CAST(lcl_c AS BIGINT) AS lcl_c,
        | CAST(sum(CASE WHEN rev_c > ucl_c THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        | CAST(sum(CASE WHEN rev_c < lcl_c THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |FROM daily, lims2
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
  )
}
