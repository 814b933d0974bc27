package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics batch over the events stream: interval concurrency
  * (sweep-line) and cohort retention — the two query classes a usage
  * warehouse runs hourly, both exact-integer so the oracles replay with
  * no rounding anywhere.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  /** Session intervals per user: the same 30-min-gap lag+cumsum
    * sessionization as q_sessionize, reduced to (start, end). */
  private def sessionIntervals(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s"), max("ts").as("e"))
  }

  /** Hourly peak concurrent sessions + session starts — the sweep-line
    * interval query ([[graft.operators.Intervals]]: distributed two-level
    * prefix sum, NO single-partition global window; the oracle replays
    * the same sweep as one flat running sum, which is exactly what the
    * bucketed form must equal). Closed-interval semantics; peaks include
    * concurrency carried into the hour. */
  val qConcurrency: Q = (s, d) =>
    graft.operators.Intervals.hourlyPeakConcurrency(sessionIntervals(s, d))
      .select(
        date_format(col("bucket"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("peak_concurrent"), col("n_starts"))
      .orderBy("hour")

  /** Cohort retention matrix: users cohorted by first-signup day; for
    * day offsets 0–7, how many of each cohort were active (any event).
    * distinct(user, day) collapses the fact table BEFORE the cohort
    * join — the join input is bounded by users×days, not by events. */
  val qRetentionCohorts: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(date_trunc("day", min("ts")).as("cohort_day"))
    val active = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    cohorts.join(active, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") >= 0 && col("day_offset") <= 7)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        col("day_offset").cast("long").as("day_offset"),
        col("n_active"))
      .orderBy("cohort", "day_offset")
  }

  val all: Map[String, Q] = Map(
    "q_concurrency" -> qConcurrency,
    "q_retention_cohorts" -> qRetentionCohorts,
  )

  /** Shared session-interval CTEs (mirrors q_sessionize's oracle). */
  private val sessionCtes =
    """w AS (
      | SELECT user_id, event_id, ts,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      | FROM events),
      |b AS (
      | SELECT *, CASE WHEN prev_ts IS NULL
      |   OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS brk
      | FROM w),
      |sess AS (
      | SELECT user_id, ts,
      |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      | FROM b),
      |iv AS (SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
      |       FROM sess GROUP BY user_id, session_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_concurrency" ->
      s"""WITH $sessionCtes,
         |bd AS (SELECT s AS ts, 1 AS delta FROM iv
         |       UNION ALL SELECT e AS ts, -1 AS delta FROM iv),
         |r AS (SELECT ts, delta,
         |  sum(delta) OVER (ORDER BY ts ASC, delta DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
         | FROM bd)
         |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         | CAST(max(greatest(conc, conc - delta)) AS BIGINT) AS peak_concurrent,
         | CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
         |FROM r GROUP BY hour ORDER BY hour""".stripMargin,
    "q_retention_cohorts" ->
      """WITH cohorts AS (
        | SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        | FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |active AS (
        | SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
        |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort,
        | CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
        | CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_active
        |FROM cohorts c JOIN active a USING (user_id)
        |WHERE date_diff('day', c.cohort_day, a.day) BETWEEN 0 AND 7
        |GROUP BY cohort, day_offset ORDER BY cohort, day_offset""".stripMargin,
  )
}
