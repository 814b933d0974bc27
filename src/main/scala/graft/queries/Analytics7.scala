package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r7m batch — window-surface completion (cume_dist / nth_value /
  * defaulted lead, the three analytic functions the q_window_* family
  * didn't yet pin) and the week-over-week growth report.
  */
object Analytics7 {
  type Q = (SparkSession, String) => DataFrame

  /** Analytic-function completion over orders: per priority class,
    * each order's cumulative distribution position, the partition's
    * 2nd-smallest total (nth_value over the FULL frame — both engines
    * default the frame to unbounded-preceding..current-row, so the
    * spec is explicit), and the next-larger total with a −1 sentinel
    * default (defaulted lead). Ordering is (total_c, o_orderkey) — a
    * TOTAL order, so every function is tie-proof deterministic; the
    * cume_dist double is a single integer division, IEEE-identical
    * across engines.
    *
    * 100 TB shape: one shuffle on the partition key; priority classes
    * are few but each partition streams through the window operator in
    * sorted runs (spillable) — no driver materialization. */
  val qWindowExtras: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_c"))
    val wOrd = Window.partitionBy("priority").orderBy("total_c", "o_orderkey")
    val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(col("o_orderkey"), col("priority"), col("total_c"),
        cume_dist().over(wOrd).as("cdist"),
        nth_value(col("total_c"), 2).over(wFull).as("second_smallest_c"),
        lead(col("total_c"), 1, -1L).over(wOrd).as("next_total_c"))
      .orderBy("priority", "total_c", "o_orderkey")
  }

  /** Week-over-week revenue growth: weekly order totals (exact integer
    * cents), previous week via lag, growth in integer basis points.
    * Growth can be NEGATIVE, and integer division disagrees across
    * engines there (Spark `div` truncates toward zero, DuckDB `//`
    * floors) — so the quotient is computed on the ABSOLUTE delta
    * (where truncation ≡ floor) and the sign reapplied: exact and
    * portable. date_trunc('week') is ISO-Monday in both engines.
    *
    * 100 TB shape: the fact-sized work is ONE partial-agg'd groupBy to
    * |weeks| rows; the lag window runs single-partition but over the
    * ≤|weeks|-row aggregate — the boundary-window pattern PLANS.md
    * already budgets, never the fact. */
  val qWowGrowth: Q = (s, d) => {
    val weekly = Tables.orders(s, d)
      .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd")
        .as("week"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_c"))
    val w = Window.orderBy("week")
    weekly
      .withColumn("prev_c", lag("revenue_c", 1).over(w))
      .withColumn("growth_bp",
        expr("CASE WHEN prev_c IS NULL THEN NULL " +
          "WHEN revenue_c >= prev_c THEN ((revenue_c - prev_c) * 10000) div prev_c " +
          "ELSE -(((prev_c - revenue_c) * 10000) div prev_c) END"))
      .orderBy("week")
  }

  /** Smoothed target encoding (the m-estimate the feature-engineering
    * step applies to a categorical column before model training):
    * category → blend of its mean target and the global mean, weighted
    * by support (m = 100 pseudo-observations). ALL integer math — the
    * global mean floors to cents once, the blend floors once — so the
    * encoding is bit-identical cross-engine, no float mean in sight.
    *
    * 100 TB shape: one partial-agg'd groupBy to |categories| rows plus
    * a 1-row global broadcast; the encode-back join onto the fact (not
    * shown — it is q_decontam's broadcast shape) ships only the tiny
    * encoding table. */
  val qTargetEncoding: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
    val glob = ev.agg(expr("sum(v_c) div count(*)").as("gmean_c"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v_c").as("sum_c"))
      .crossJoin(glob)
      .select(col("event_type"), col("n"), col("sum_c"), col("gmean_c"),
        expr("(sum_c + 100 * gmean_c) div (n + 100)").as("enc_c"))
      .orderBy("event_type")
  }

  val all: Map[String, Q] = Map(
    "q_window_extras" -> qWindowExtras,
    "q_wow_growth" -> qWowGrowth,
    "q_target_encoding" -> qTargetEncoding,
  )

  val oracles: Map[String, String] = Map(
    "q_window_extras" ->
      """SELECT o_orderkey, o_orderpriority AS priority,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
        | cume_dist() OVER w AS cdist,
        | nth_value(CAST(round(o_totalprice * 100) AS BIGINT), 2) OVER
        |  (PARTITION BY o_orderpriority
        |   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |  AS second_smallest_c,
        | lead(CAST(round(o_totalprice * 100) AS BIGINT), 1, -1) OVER w
        |  AS next_total_c
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        | ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
        |ORDER BY priority, total_c, o_orderkey""".stripMargin,
    "q_wow_growth" ->
      """WITH weekly AS (
        | SELECT strftime(date_trunc('week', CAST(o_orderdate AS DATE)),
        |   '%Y-%m-%d') AS week,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS revenue_c
        | FROM orders GROUP BY 1),
        |lagged AS (
        | SELECT week, n_orders, revenue_c,
        |  lag(revenue_c, 1) OVER (ORDER BY week) AS prev_c
        | FROM weekly)
        |SELECT week, n_orders, revenue_c, prev_c,
        | CASE WHEN prev_c IS NULL THEN NULL
        |  WHEN revenue_c >= prev_c THEN ((revenue_c - prev_c) * 10000) // prev_c
        |  ELSE -(((prev_c - revenue_c) * 10000) // prev_c) END AS growth_bp
        |FROM lagged ORDER BY week""".stripMargin,
    "q_target_encoding" ->
      """WITH ev AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
        | FROM events),
        |g AS (SELECT CAST(sum(v_c) AS BIGINT) // count(*) AS gmean_c FROM ev)
        |SELECT event_type, count(*) AS n,
        | CAST(sum(v_c) AS BIGINT) AS sum_c, gmean_c,
        | (CAST(sum(v_c) AS BIGINT) + 100 * gmean_c) // (count(*) + 100) AS enc_c
        |FROM ev CROSS JOIN g
        |GROUP BY event_type, gmean_c ORDER BY event_type""".stripMargin,
  )
}
