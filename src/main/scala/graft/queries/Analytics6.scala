package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r7l batch — calendar analytics: multiplicative weekday-seasonality
  * index of the event feed, and exact ship-latency percentiles computed
  * over the bounded day domain (no sort-based selection at all).
  */
object Analytics6 {
  type Q = (SparkSession, String) => DataFrame

  /** Weekday seasonality index: mean daily event count per weekday vs
    * the overall mean daily count, in integer milli (1000 = flat) —
    * the multiplicative profile a forecast divides out. All arithmetic
    * on exact BIGINT day counts; the two integer-div means cancel scale.
    *
    * 100 TB shape: one partial-agg'd daily-count pass; the index lives
    * on a 7-row frame with a 1-row broadcast denominator. */
  val qSeasonality: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(dayofweek(col("day")).cast("long").as("dow"), col("x"))
    val overall = daily.agg(sum("x").as("tot"), count(lit(1)).as("n_days"))
    daily.groupBy("dow")
      .agg(count(lit(1)).as("n_days_dow"), sum("x").as("x_dow"))
      .crossJoin(overall)
      .select(col("dow"), col("n_days_dow"), col("x_dow"),
        expr("(x_dow * n_days * 1000L) div (n_days_dow * tot)").as("index_milli"))
      .orderBy("dow")
  }

  /** Ship-latency percentiles per order priority — EXACT p50/p90/p99 of
    * (l_shipdate − o_orderdate) days, computed by counting over the
    * BOUNDED latency domain instead of sorting rows: per (priority,
    * days) counts, a cumulative window over the ≤|domain| frame, and
    * the percentile = the smallest latency whose cumulative count
    * reaches ⌈p·n⌉ (the classic type-1 quantile — integer-exact, no
    * interpolation).
    *
    * 100 TB shape: the fact-sized work is ONE partial-agg'd groupBy;
    * the selection runs on |priorities|·|day domain| rows (hundreds),
    * never a per-group sort of the fact. */
  val qShipLatency: Q = (s, d) => {
    val lat = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .select("o_orderkey", "o_orderpriority", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("days"))
    val counts = lat.groupBy("priority", "days").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("priority").orderBy("days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("priority")))
    def pct(p: Int) = min(when(col("cum") * 100 >= col("n") * p, col("days"))).as(s"p$p")
    cum.groupBy("priority")
      .agg(max("n").as("n_items"), pct(50), pct(90), pct(99))
      .orderBy("priority")
  }

  val all: Map[String, Q] = Map(
    "q_seasonality" -> qSeasonality,
    "q_ship_latency" -> qShipLatency,
  )

  val oracles: Map[String, String] = Map(
    "q_seasonality" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS day, count(*) AS x FROM events GROUP BY 1),
        |dw AS (
        | SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS dow, x FROM daily),
        |o AS (SELECT CAST(sum(x) AS BIGINT) AS tot, count(*) AS n_days FROM daily)
        |SELECT dow, count(*) AS n_days_dow, CAST(sum(x) AS BIGINT) AS x_dow,
        | (CAST(sum(x) AS BIGINT) * n_days * 1000) // (count(*) * tot) AS index_milli
        |FROM dw CROSS JOIN o GROUP BY dow, n_days, tot ORDER BY dow""".stripMargin,
    "q_ship_latency" ->
      """WITH lat AS (
        | SELECT o_orderpriority AS priority,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS days
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |c AS (SELECT priority, days, count(*) AS c FROM lat GROUP BY 1, 2),
        |cu AS (
        | SELECT priority, days, c,
        |  CAST(sum(c) OVER (PARTITION BY priority ORDER BY days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(c) OVER (PARTITION BY priority) AS BIGINT) AS n
        | FROM c)
        |SELECT priority, max(n) AS n_items,
        | min(CASE WHEN cum * 100 >= n * 50 THEN days END) AS p50,
        | min(CASE WHEN cum * 100 >= n * 90 THEN days END) AS p90,
        | min(CASE WHEN cum * 100 >= n * 99 THEN days END) AS p99
        |FROM cu GROUP BY priority ORDER BY priority""".stripMargin,
  )
}
