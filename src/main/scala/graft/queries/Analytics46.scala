package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 28: the model-diagnostics tail — Nelson–Aalen cumulative
  * hazard (the exactly-integer twin of q_survival_km's KM curve),
  * expected calibration error, the Chow structural-break test, and the
  * Ljung–Box portmanteau. Hazard increments floor once per event time
  * (micro receipts documented); everything else rides exact moments.
  */
object Analytics46 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Nelson–Aalen cumulative hazard of time-to-first-purchase (hours,
    * 48 h administrative censoring — the q_survival_km cohort): per
    * event hour, the at-risk count, conversions, the hazard increment
    * ⌊d·10⁶/n_risk⌋ and its running sum — ALL integer (KM needs
    * exp/ln; NA doesn't, so this one is hash-exact against the
    * oracle with no float discipline at all).
    *
    * 100 TB shape: one per-user extent pass; the curve lives on a
    * ≤49-row frame. */
  val qNelsonAalen: Q = (s, d) => {
    val horizon = 48L
    val perUser = Tables.events(s, d).groupBy("user_id").agg(
      min(unix_micros(col("ts"))).as("f_us"),
      min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("fp_us"))
    val lifetimes = perUser.select(
      expr(s"""CASE WHEN fp_us IS NULL OR (fp_us - f_us) div 3600000000L >= $horizon
              | THEN ${horizon}L ELSE (fp_us - f_us) div 3600000000L END""".stripMargin)
        .as("t_hour"),
      expr(s"""CAST(fp_us IS NULL OR (fp_us - f_us) div 3600000000L >= $horizon
              | AS BIGINT)""".stripMargin).as("censored"))
    val perHour = lifetimes.groupBy("t_hour")
      .agg(sum(lit(1L) - col("censored")).as("d_conv"),
        sum(col("censored")).as("c_censored"))
    val w = Window.orderBy("t_hour")
    perHour
      .withColumn("upto", sum(col("d_conv") + col("c_censored"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(lifetimes.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_risk",
        col("n_total") - col("upto") + col("d_conv") + col("c_censored"))
      .withColumn("h_inc_micro", expr("(d_conv * 1000000) div n_risk"))
      .withColumn("h_cum_micro",
        sum("h_inc_micro").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("d_conv") > 0)
      .select("t_hour", "n_risk", "d_conv", "h_inc_micro", "h_cum_micro")
      .orderBy("t_hour")
  }

  /** Expected calibration error of the q_brier_decomp forecaster
    * (priority-bin rates fit on even order keys, evaluated on odd):
    * ECE = Σ nₖ·|p̂ₖ − ȳₖ| div N with the gaps in exact ppm — one
    * number for "how honest are the probabilities".
    *
    * 100 TB shape: two bin-censuses + a 5-row readout. */
  val qEce: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority").as("bin"), col("o_orderkey"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
    val train = o.filter(col("o_orderkey") % 2 === 0)
      .groupBy("bin").agg(expr("(sum(y) * 1000000) div count(1)").as("phat_ppm"))
    val test = o.filter(col("o_orderkey") % 2 === 1)
      .groupBy("bin").agg(count(lit(1)).as("n_t"),
        expr("(sum(y) * 1000000) div count(1)").as("ybar_ppm"))
    test.join(train, "bin")
      .agg(sum("n_t").as("n_test"),
        sum(expr("n_t * abs(phat_ppm - ybar_ppm)")).as("gap_sum"),
        max(expr("abs(phat_ppm - ybar_ppm)")).as("mce_ppm"))
      .select(col("n_test"),
        expr("gap_sum div n_test").as("ece_ppm"), col("mce_ppm"))
  }

  /** Chow structural-break test at the series midpoint: OLS of daily
    * revenue on the day index fit on each half and pooled, F =
    * ((SSR_p − SSR₁ − SSR₂)/2)/((SSR₁+SSR₂)/(n−4)) from exact
    * decimal moments (SSR in closed form: Syy − Sxy²/Sxx on centered
    * n-scaled sums), 6dp.
    *
    * 100 TB shape: three moment groups over the |days| frame. */
  val qChowTest: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .withColumn("i", expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT)"))
    val mid = daily.agg(expr("CAST(min(i) + (max(i) - min(i)) div 2 AS BIGINT)").as("mid"))
    val m = daily.join(broadcast(mid))
      .groupBy(expr("CASE WHEN i <= mid THEN 1 ELSE 2 END").as("seg"))
      .agg(count(lit(1)).as("n"),
        sum(col("i").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * i")).as("sxx"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
    val ssr =
      """((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
         - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           * ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) / n"""
    val segs = m.select(col("seg"), col("n"), expr(s"$ssr").as("ssr"),
      col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
    val pooled = m.agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
        sum("sxx").as("sxx"), sum("sxy").as("sxy"), sum("syy").as("syy"))
      .select(expr(s"$ssr").as("ssr_p"), col("n"))
    val halves = segs.agg(sum("ssr").as("ssr_12"), sum("n").as("n12"),
      count(lit(1)).as("k"))
    halves.join(broadcast(pooled))
      .select(col("n").as("n_days"),
        expr("""CAST(round(((ssr_p - ssr_12) / 2) / (ssr_12 / (n - 4)), 6)
                AS DOUBLE)""").as("chow_f"))
  }

  /** Ljung–Box portmanteau over lags 1..5 of daily revenue:
    * Q = n(n+2)·Σ rₖ²/(n−k), each rₖ the exact-moment correlation of
    * the k-lagged interior pairs (the q_pacf machinery swept over a
    * broadcast lag frame), 6dp readout.
    *
    * 100 TB shape: one |days|×5 lag equi-join + 5 moment groups. */
  val qLjungBox: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
    import s.implicits._
    val lags = broadcast((1 to 5).toDF("k"))
    val pairs = daily.select(col("rn"), col("x").cast("decimal(38,0)").as("a"))
      .crossJoin(lags)
      .join(daily.select(col("rn").as("rn2"), col("x").cast("decimal(38,0)").as("b")),
        expr("rn2 = rn + k"))
    val rs = pairs.groupBy("k")
      .agg(count(lit(1)).as("m"), sum("a").as("sa"), sum("b").as("sb"),
        sum(col("a") * col("a")).as("saa"), sum(col("b") * col("b")).as("sbb"),
        sum(col("a") * col("b")).as("sab"))
      .withColumn("r", expr(
        """(m * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
           / (sqrt(m * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
            * sqrt(m * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))"""))
    val n1 = daily.agg(count(lit(1)).as("n"))
    rs.join(broadcast(n1))
      .agg(max("n").as("n_days"),
        sum(expr("r * r / (n - k)")).as("qsum"))
      .select(col("n_days"),
        expr("CAST(round(n_days * (n_days + 2) * qsum, 6) AS DOUBLE)").as("lb_q"))
  }

  val all: Map[String, Q] = Map(
    "q_nelson_aalen" -> qNelsonAalen,
    "q_ece" -> qEce,
    "q_chow_test" -> qChowTest,
    "q_ljung_box" -> qLjungBox,
  )

  val oracles: Map[String, String] = Map(
    "q_nelson_aalen" ->
      """WITH pu AS (
        | SELECT user_id, min(epoch_us(ts)) AS f_us,
        |   min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp_us
        | FROM events GROUP BY user_id),
        |lt AS (
        | SELECT CASE WHEN fp_us IS NULL OR (fp_us - f_us) // 3600000000 >= 48
        |   THEN 48 ELSE (fp_us - f_us) // 3600000000 END AS t_hour,
        |  CASE WHEN fp_us IS NULL OR (fp_us - f_us) // 3600000000 >= 48
        |   THEN 1 ELSE 0 END AS censored
        | FROM pu),
        |ph AS (
        | SELECT t_hour, CAST(sum(1 - censored) AS BIGINT) AS d_conv,
        |   CAST(sum(censored) AS BIGINT) AS c_censored
        | FROM lt GROUP BY t_hour),
        |tot AS (SELECT count(*) AS n_total FROM lt),
        |cum AS (
        | SELECT t_hour, d_conv, c_censored,
        |  n_total - sum(d_conv + c_censored) OVER (ORDER BY t_hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    + d_conv + c_censored AS n_risk
        | FROM ph, tot),
        |haz AS (
        | SELECT t_hour, n_risk, d_conv,
        |   (d_conv * 1000000) // n_risk AS h_inc_micro
        | FROM cum)
        |SELECT t_hour, CAST(n_risk AS BIGINT) AS n_risk, d_conv,
        | CAST(h_inc_micro AS BIGINT) AS h_inc_micro,
        | CAST(sum(h_inc_micro) OVER (ORDER BY t_hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS h_cum_micro
        |FROM haz WHERE d_conv > 0
        |ORDER BY t_hour""".stripMargin,
    "q_ece" ->
      """WITH o AS (
        | SELECT o_orderpriority AS bin, o_orderkey,
        |   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        | FROM orders),
        |train AS (
        | SELECT bin, (sum(y) * 1000000) // count(*) AS phat_ppm
        | FROM o WHERE o_orderkey % 2 = 0 GROUP BY bin),
        |test AS (
        | SELECT bin, count(*) AS n_t,
        |   (sum(y) * 1000000) // count(*) AS ybar_ppm
        | FROM o WHERE o_orderkey % 2 = 1 GROUP BY bin)
        |SELECT CAST(sum(n_t) AS BIGINT) AS n_test,
        | CAST(sum(n_t * abs(phat_ppm - ybar_ppm)) // sum(n_t) AS BIGINT) AS ece_ppm,
        | CAST(max(abs(phat_ppm - ybar_ppm)) AS BIGINT) AS mce_ppm
        |FROM test JOIN train USING (bin)""".stripMargin,
    "q_chow_test" -> {
      val ssr =
        """((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
          | - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |   * ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) / n"""
          .stripMargin.replace("\n", " ")
      s"""WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y,
        |   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS i
        | FROM orders GROUP BY 1, 3),
        |mid AS (SELECT min(i) + (max(i) - min(i)) // 2 AS mid FROM daily),
        |m AS (
        | SELECT CASE WHEN i <= mid THEN 1 ELSE 2 END AS seg, count(*) AS n,
        |  CAST(sum(i) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |  CAST(sum(CAST(i AS HUGEINT) * i) AS HUGEINT) AS sxx,
        |  CAST(sum(CAST(i AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |  CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        | FROM daily, mid GROUP BY 1),
        |segs AS (SELECT seg, n, $ssr AS ssr FROM m),
        |pooled AS (
        | SELECT $ssr AS ssr_p, n FROM (
        |  SELECT CAST(sum(n) AS BIGINT) AS n,
        |   CAST(sum(sx) AS HUGEINT) AS sx, CAST(sum(sy) AS HUGEINT) AS sy,
        |   CAST(sum(sxx) AS HUGEINT) AS sxx, CAST(sum(sxy) AS HUGEINT) AS sxy,
        |   CAST(sum(syy) AS HUGEINT) AS syy
        |  FROM m) t),
        |halves AS (
        | SELECT CAST(sum(ssr) AS DOUBLE) AS ssr_12, sum(n) AS n12 FROM segs)
        |SELECT CAST(p.n AS BIGINT) AS n_days,
        | CAST(round(((ssr_p - ssr_12) / 2) / (ssr_12 / (p.n - 4)), 6) AS DOUBLE)
        |   AS chow_f
        |FROM halves h, pooled p""".stripMargin
    },
    "q_ljung_box" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM orders GROUP BY 1),
        |idx AS (
        | SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily),
        |pairs AS (
        | SELECT k, a.x AS xa, b.x AS xb
        | FROM idx a CROSS JOIN range(1, 6) t(k)
        | JOIN idx b ON b.rn = a.rn + k),
        |rs AS (
        | SELECT k, count(*) AS m,
        |  CAST(sum(xa) AS HUGEINT) AS sa, CAST(sum(xb) AS HUGEINT) AS sb,
        |  CAST(sum(CAST(xa AS HUGEINT) * xa) AS HUGEINT) AS saa,
        |  CAST(sum(CAST(xb AS HUGEINT) * xb) AS HUGEINT) AS sbb,
        |  CAST(sum(CAST(xa AS HUGEINT) * xb) AS HUGEINT) AS sab
        | FROM pairs GROUP BY k),
        |r_ AS (
        | SELECT k,
        |  (m * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |  / (sqrt(m * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |   * sqrt(m * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
        |   AS r
        | FROM rs),
        |n_ AS (SELECT count(*) AS n FROM daily)
        |SELECT CAST(n AS BIGINT) AS n_days,
        | CAST(round(n * (n + 2) * sum(r * r / (n - k)), 6) AS DOUBLE) AS lb_q
        |FROM r_, n_ GROUP BY n""".stripMargin,
  )
}
