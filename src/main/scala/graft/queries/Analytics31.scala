package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 13: the experimentation/forecasting layer — Holt linear
  * smoothing, SPRT sequential stopping, power analysis, closed-form
  * ridge regression, and the Cochran–Armitage trend test. Constants
  * that classically come from libm (ln 1.2, ln 19, normal quantiles,
  * the Shewhart/Laplace families) are LITERAL integers or decimal
  * literals in both engines; data-dependent transcendentals are
  * micro-rounded once on a 1-row frame (the q_transition_entropy
  * discipline). The Holt recursion is the one genuinely sequential
  * readout: both engines run the SAME IEEE double recurrence in the
  * same textual op order over the same ≤2.4k-element array, so the
  * trajectories are byte-identical (the q_spearman argument, iterated).
  */
object Analytics31 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Holt double-exponential smoothing (α=0.3, β=0.1) of daily
    * revenue cents, with the 7-day-ahead linear forecast. The
    * recurrence folds over the day-sorted array with Spark's
    * `aggregate` higher-order function (codegen'd, no UDF); the
    * oracle replays it as a recursive CTE — step t's level is
    * computed once there and twice here, but from identical inputs
    * with identical op order, so the doubles agree bitwise.
    *
    * 100 TB shape: the fact collapses to the bounded |days| frame
    * before anything sequential; the fold is O(|days|) on one core by
    * nature (a time-series recursion has no parallel form — this is
    * the documented exception, on a ≤2.4k array). */
  val qHoltLinear: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    daily.agg(
        count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, rev_c))), x -> CAST(x.rev_c AS DOUBLE))")
          .as("ys"))
      .withColumn("fin", expr(
        """aggregate(slice(ys, 3, size(ys) - 2),
           named_struct('l', element_at(ys, 1),
             'b', element_at(ys, 2) - element_at(ys, 1)),
           (acc, y) -> named_struct(
             'l', 0.3 * y + 0.7 * (acc.l + acc.b),
             'b', 0.1 * ((0.3 * y + 0.7 * (acc.l + acc.b)) - acc.l) + 0.9 * acc.b))"""))
      .select(col("n_days"),
        expr("CAST(round(fin.l, 6) AS DOUBLE)").as("level"),
        expr("CAST(round(fin.b, 6) AS DOUBLE)").as("trend"),
        expr("CAST(round(fin.l + 7 * fin.b, 6) AS DOUBLE)").as("forecast7"))
  }

  /** SPRT sequential A/B stopping: treat users with odd ids as the
    * treatment arm, test H0: p = p₀ (the control arm's purchase rate)
    * against H1: p = 1.2·p₀, α=β=0.05. Per-day log-likelihood
    * increments are exact integers — k·ln(1.2) uses the LITERAL
    * 182322 µnats and the (n−k)·ln((1−1.2p₀)/(1−p₀)) factor is
    * micro-rounded ONCE on the 1-row control-rate frame — so the
    * cumulative LLR and the ±ln19 (±2944439 µ) boundary crossings
    * are integer-exact and engine-identical. decision: 1 = reject H0
    * (lift confirmed), −1 = accept H0, 0 = keep collecting.
    *
    * 100 TB shape: two partial-agg'd passes (control rate, treatment
    * day census); the cumsum window runs over the bounded |days|
    * frame. */
  val qSprt: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").cast("string").as("day"),
        (col("event_type") === "purchase").cast("long").as("is_p"))
    val p0 = ev.filter(col("user_id") % 2 === 0)
      .agg(sum("is_p").as("c0"), count(lit(1)).as("t0"))
      .select(col("c0"), col("t0"),
        expr("""CAST(round(ln((1 - 1.2 * (CAST(c0 AS DOUBLE) / t0))
                / (1 - CAST(c0 AS DOUBLE) / t0)) * 1000000) AS BIGINT)""")
          .as("lnq_micro"))
    val dayCensus = ev.filter(col("user_id") % 2 === 1)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum("is_p").as("k"))
    val wd = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    dayCensus.join(broadcast(p0))
      .withColumn("inc", expr("k * 182322 + (n - k) * lnq_micro"))
      .withColumn("llr_micro", sum("inc").over(wd))
      .select(col("day"), col("n"), col("k"), col("llr_micro"),
        expr("""CAST(CASE WHEN llr_micro >= 2944439 THEN 1
                WHEN llr_micro <= -2944439 THEN -1 ELSE 0 END AS BIGINT)""").as("decision"))
      .orderBy("day")
  }

  /** Two-sample power analysis: events needed per arm to detect a 2%
    * lift in mean purchase value at α=0.05 (two-sided), power 0.80.
    * n = (z₀.₉₇₅+z₀.₈)²·2σ²/δ², with the normal quantiles as FULL
    * 16-digit literals (no erf⁻¹ at runtime), σ² from exact decimal
    * cent moments, δ = 0.02·mean. The one-row double readout is
    * op-order-identical; n_required ceils it (the ceil boundary sits
    * ~10⁸ ulps from any plausible value).
    *
    * 100 TB shape: one partial-agg'd moment pass over the filtered
    * scan. */
  val qAbPower: Q = (s, d) => {
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0))").as("vc"))
      .agg(count(lit(1)).as("n"), sum("vc").as("sx"),
        sum(col("vc") * col("vc")).as("sxx"))
      .select(col("n"),
        expr("CAST(round(CAST(sx AS DOUBLE) / n, 6) AS DOUBLE)").as("mean_c"),
        expr("""CAST(round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
                / (n - 1), 6) AS DOUBLE)""").as("var_c2"),
        expr("""CAST(ceil(
            (1.959963984540054E0 + 0.8416212335729143E0) * (1.959963984540054E0 + 0.8416212335729143E0)
            * 2 * ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n)) / (n - 1))
            / ((0.02 * (CAST(sx AS DOUBLE) / n)) * (0.02 * (CAST(sx AS DOUBLE) / n))))
            AS BIGINT)""").as("n_per_arm"))
  }

  /** Closed-form ridge regression of price cents on (quantity,
    * discount-hundredths), λ = 10⁶ cents² on the centered Gram. The
    * 2×2 normal equations solve in determinant form from the nine
    * DECIMAL(38,0)-exact moments; β₁, β₂ and the intercept read out
    * as one-row doubles in oracle-identical op order (6dp).
    *
    * 100 TB shape: ONE partial-aggregable moment pass; the "solve" is
    * scalar arithmetic on a 1-row frame. */
  val qRidgeClosed: Q = (s, d) => {
    val m = Tables.lineitem(s, d).select(
        expr("CAST(CAST(round(l_quantity) AS BIGINT) AS DECIMAL(38,0))").as("x1"),
        expr("CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))").as("x2"),
        expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))").as("y"))
      .agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("s11"), sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x1") * col("y")).as("s1y"), sum(col("x2") * col("y")).as("s2y"))
    val a11 = "(CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) + 1000000.0)"
    val a22 = "(CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n) + 1000000.0)"
    val a12 = "(CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n))"
    val c1 = "(CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(sy AS DOUBLE) / n))"
    val c2 = "(CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(sy AS DOUBLE) / n))"
    val det = s"($a11 * $a22 - $a12 * $a12)"
    val b1 = s"(($c1 * $a22 - $c2 * $a12) / $det)"
    val b2 = s"(($c2 * $a11 - $c1 * $a12) / $det)"
    m.select(col("n"),
      expr(s"CAST(round($b1, 6) AS DOUBLE)").as("beta_qty"),
      expr(s"CAST(round($b2, 6) AS DOUBLE)").as("beta_disc"),
      expr(s"""CAST(round(CAST(sy AS DOUBLE) / n
              - $b1 * (CAST(s1 AS DOUBLE) / n)
              - $b2 * (CAST(s2 AS DOUBLE) / n), 6) AS DOUBLE)""").as("intercept"))
  }

  /** Cochran–Armitage trend test: does the 'F' order-status rate
    * trend monotonically across the ordered priorities 1-URGENT…
    * 5-LOW (scores 1..5)? The numerator T = Σsᵢ(xᵢN − nᵢX) and both
    * variance factors are exact DECIMAL(38,0) integers; z reads out
    * as a one-row double (6dp), χ² = z² alongside.
    *
    * 100 TB shape: one 5-row census pass; scores come from the
    * priority's leading digit (no lookup table to ship). */
  val qCochranArmitage: Q = (s, d) => {
    val cells = Tables.orders(s, d)
      .groupBy(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("sc"))
      .agg(count(lit(1)).as("n_i"),
        sum((col("o_orderstatus") === "F").cast("long")).as("x_i"))
    cells.agg(
        sum("n_i").as("nn"), sum("x_i").as("xx"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * x_i")).as("sx"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * n_i")).as("sn"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * sc * n_i")).as("sn2"))
      .withColumn("t_num", expr("CAST(nn AS DECIMAL(38,0)) * sx - CAST(xx AS DECIMAL(38,0)) * sn"))
      .withColumn("v_fac", expr("CAST(nn AS DECIMAL(38,0)) * sn2 - sn * sn"))
      .select(col("nn").as("n"),
        expr("""CAST(round(CAST(t_num AS DOUBLE)
                / sqrt((CAST(xx AS DOUBLE) / nn) * (1 - CAST(xx AS DOUBLE) / nn)
                  * nn * CAST(v_fac AS DOUBLE)), 6) AS DOUBLE)""").as("z_trend"),
        expr("""CAST(round((CAST(t_num AS DOUBLE) * CAST(t_num AS DOUBLE))
                / ((CAST(xx AS DOUBLE) / nn) * (1 - CAST(xx AS DOUBLE) / nn)
                  * nn * CAST(v_fac AS DOUBLE)), 6) AS DOUBLE)""").as("chi2_trend"))
  }

  val all: Map[String, Q] = Map(
    "q_holt_linear" -> qHoltLinear,
    "q_sprt" -> qSprt,
    "q_ab_power" -> qAbPower,
    "q_ridge_closed" -> qRidgeClosed,
    "q_cochran_armitage" -> qCochranArmitage,
  )

  val oracles: Map[String, String] = Map(
    "q_holt_linear" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |arr AS (
        | SELECT count(*) AS n_days,
        |   list(CAST(rev_c AS DOUBLE) ORDER BY day) AS ys
        | FROM daily),
        |rec AS (
        | WITH RECURSIVE h(t, l, b) AS (
        |  SELECT 2, ys[1], ys[2] - ys[1] FROM arr
        |  UNION ALL
        |  SELECT t2, l2, 0.1 * (l2 - l1) + 0.9 * b1
        |  FROM (
        |   SELECT h.t + 1 AS t2,
        |     0.3 * arr.ys[h.t + 1] + 0.7 * (h.l + h.b) AS l2,
        |     h.l AS l1, h.b AS b1
        |   FROM h, arr WHERE h.t < arr.n_days))
        | SELECT * FROM h)
        |SELECT a.n_days,
        | CAST(round(r.l, 6) AS DOUBLE) AS level,
        | CAST(round(r.b, 6) AS DOUBLE) AS trend,
        | CAST(round(r.l + 7 * r.b, 6) AS DOUBLE) AS forecast7
        |FROM arr a JOIN rec r ON r.t = a.n_days""".stripMargin,
    "q_sprt" ->
      """WITH ev AS (
        | SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        | FROM events),
        |p0 AS (
        | SELECT CAST(round(ln((1 - 1.2 * (CAST(sum(is_p) AS DOUBLE) / count(*)))
        |     / (1 - CAST(sum(is_p) AS DOUBLE) / count(*))) * 1000000) AS BIGINT)
        |   AS lnq_micro
        | FROM ev WHERE user_id % 2 = 0),
        |dc AS (
        | SELECT day, count(*) AS n, CAST(sum(is_p) AS BIGINT) AS k
        | FROM ev WHERE user_id % 2 = 1 GROUP BY day),
        |cum AS (
        | SELECT day, n, k,
        |   sum(k * 182322 + (n - k) * lnq_micro) OVER
        |     (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     AS llr_micro
        | FROM dc, p0)
        |SELECT day, n, k, CAST(llr_micro AS BIGINT) AS llr_micro,
        | CAST(CASE WHEN llr_micro >= 2944439 THEN 1
        |  WHEN llr_micro <= -2944439 THEN -1 ELSE 0 END AS BIGINT) AS decision
        |FROM cum ORDER BY day""".stripMargin,
    "q_ab_power" ->
      """WITH m AS (
        | SELECT count(*) AS n,
        |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(round(value * 100) AS BIGINT)
        |     * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS sxx
        | FROM events WHERE event_type = 'purchase')
        |SELECT n,
        | CAST(round(CAST(sx AS DOUBLE) / n, 6) AS DOUBLE) AS mean_c,
        | CAST(round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n))
        |   / (n - 1), 6) AS DOUBLE) AS var_c2,
        | CAST(ceil(
        |   (1.959963984540054E0 + 0.8416212335729143E0) * (1.959963984540054E0 + 0.8416212335729143E0)
        |   * 2 * ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) / n)) / (n - 1))
        |   / ((0.02 * (CAST(sx AS DOUBLE) / n)) * (0.02 * (CAST(sx AS DOUBLE) / n))))
        |   AS BIGINT) AS n_per_arm
        |FROM m""".stripMargin,
    "q_ridge_closed" ->
      """WITH m AS (
        | SELECT count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s1,
        |  CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS HUGEINT) AS s2,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sy,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s11,
        |  CAST(sum(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS HUGEINT) AS s22,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS HUGEINT) AS s12,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS s1y,
        |  CAST(sum(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS s2y
        | FROM lineitem)
        |SELECT n,
        | CAST(round((((CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n) + 1000000.0) - (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n))) / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) + 1000000.0) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n) + 1000000.0) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)))), 6) AS DOUBLE) AS beta_qty,
        | CAST(round((((CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) + 1000000.0) - (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n))) / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) + 1000000.0) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n) + 1000000.0) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)))), 6) AS DOUBLE) AS beta_disc,
        | CAST(round(CAST(sy AS DOUBLE) / n - (((CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n) + 1000000.0) - (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n))) / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) + 1000000.0) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n) + 1000000.0) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)))) * (CAST(s1 AS DOUBLE) / n) - (((CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) + 1000000.0) - (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(sy AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n))) / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n) + 1000000.0) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n) + 1000000.0) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s2 AS DOUBLE) / n)))) * (CAST(s2 AS DOUBLE) / n), 6) AS DOUBLE) AS intercept
        |FROM m""".stripMargin,
    "q_cochran_armitage" ->
      """WITH cells AS (
        | SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc,
        |   count(*) AS n_i,
        |   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
        |     AS x_i
        | FROM orders GROUP BY 1),
        |agg AS (
        | SELECT CAST(sum(n_i) AS HUGEINT) AS nn, CAST(sum(x_i) AS HUGEINT) AS xx,
        |   CAST(sum(CAST(sc AS HUGEINT) * x_i) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(sc AS HUGEINT) * n_i) AS HUGEINT) AS sn,
        |   CAST(sum(CAST(sc AS HUGEINT) * sc * n_i) AS HUGEINT) AS sn2
        | FROM cells),
        |fin AS (
        | SELECT nn, xx, nn * sx - xx * sn AS t_num, nn * sn2 - sn * sn AS v_fac
        | FROM agg)
        |SELECT CAST(nn AS BIGINT) AS n,
        | CAST(round(CAST(t_num AS DOUBLE)
        |   / sqrt((CAST(xx AS DOUBLE) / nn) * (1 - CAST(xx AS DOUBLE) / nn)
        |     * nn * CAST(v_fac AS DOUBLE)), 6) AS DOUBLE) AS z_trend,
        | CAST(round((CAST(t_num AS DOUBLE) * CAST(t_num AS DOUBLE))
        |   / ((CAST(xx AS DOUBLE) / nn) * (1 - CAST(xx AS DOUBLE) / nn)
        |     * nn * CAST(v_fac AS DOUBLE)), 6) AS DOUBLE) AS chi2_trend
        |FROM fin""".stripMargin,
  )
}
