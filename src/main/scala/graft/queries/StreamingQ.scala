package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** r7s — the Structured Streaming execution path ON the oracle surface:
  * these registry entries run real `readStream` → watermarked agg →
  * `Trigger.AvailableNow` → memory-sink pipelines to completion and
  * return the materialized table, so the driver's DuckDB compare
  * certifies the STREAMING engine's results (state store, watermark
  * bookkeeping, window merge) against independent batch SQL — not just
  * the batch planner's.
  */
object StreamingQ {
  type Q = (SparkSession, String) => DataFrame

  private val run = new AtomicLong()

  /** Watermarked tumbling 1-hour (window × type) counts and exact
    * integer-cent sums through the streaming engine, Complete mode so
    * every window is emitted. Money in cents BEFORE the agg — the
    * streaming state carries BIGINTs, so merge order cannot perturb a
    * float sum.
    *
    * 100 TB shape: the streaming agg is the same partial/final
    * hash-agg pair as the batch plan, plus a watermark-evicted window
    * state store — memory bounded by live windows, not input. */
  val qStreamWindow: Q = (s, d) => {
    val ev = Streaming.readEvents(s, d)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val agg = ev
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("cents").as("value_c"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), col("value_c"))
    val name = s"graft_stream_win_${run.incrementAndGet()}"
    Streaming.runAvailableNow(s, agg, name)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("cnt"), col("value_c"))
      .orderBy("hour", "event_type")
  }

  /** Streaming exact dedup-by-key through the state store: first event
    * per (user, type) in event-time order is NOT expressible with
    * dropDuplicates (arrival order ≠ event order under parallel file
    * splits), so this keeps min(event_id) per key via the agg state —
    * the streaming form of the batch argmax pattern. Complete mode
    * emits the final state.
    *
    * 100 TB shape: state is one row per live key; the memory-sink
    * materialization here is test-scale plumbing, a production run
    * writes to a keyed upsert sink. */
  val qStreamFirstTouch: Q = (s, d) => {
    val ev = Streaming.readEvents(s, d)
    val agg = ev
      .groupBy(col("user_id"), col("event_type"))
      .agg(min("event_id").as("first_event_id"), count(lit(1)).as("n_events"))
    val name = s"graft_stream_first_${run.incrementAndGet()}"
    Streaming.runAvailableNow(s, agg, name)
      .select(col("user_id"), col("event_type"),
        col("first_event_id"), col("n_events"))
      .orderBy("user_id", "event_type")
  }

  /** Native session windows through the streaming engine: gap-based
    * `session_window(ts, 30 min)` per user with engine-managed merge
    * state, run to completion — the oracle replays the merge rule
    * (break at gap ≥ 30 min; session end = last event + gap) as
    * window SQL, certifying the state-store session merging against an
    * independent formulation. Money in cents so session state is
    * integer. */
  val qStreamSessions: Q = (s, d) => {
    val ev = Streaming.readEvents(s, d)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val agg = ev
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("session_c"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_c"))
    val name = s"graft_stream_sess_${run.incrementAndGet()}"
    Streaming.runAvailableNow(s, agg, name)
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("session_c"))
      .orderBy("user_id", "session_start")
  }

  /** SLIDING windows (2 h duration, 1 h slide) through the streaming
    * engine: every event lands in exactly two overlapping windows, so
    * this certifies the window-ASSIGNMENT path (expand + merge state)
    * rather than the tumbling special case. The oracle replays the
    * assignment as an explicit 2-way unnest of window starts.
    *
    * 100 TB shape: the expand doubles rows BEFORE the partial agg —
    * state is per live window, input cost 2× the tumbling plan. */
  val qStreamSliding: Q = (s, d) => {
    val ev = Streaming.readEvents(s, d)
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
    val agg = ev
      .withWatermark("ts", "3 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum("cents").as("value_c"))
      .select(col("window.start").as("win_start"), col("cnt"), col("value_c"))
    val name = s"graft_stream_slide_${run.incrementAndGet()}"
    Streaming.runAvailableNow(s, agg, name)
      .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("cnt"), col("value_c"))
      .orderBy("win_start")
  }

  val all: Map[String, Q] = Map(
    "q_stream_window" -> qStreamWindow,
    "q_stream_first_touch" -> qStreamFirstTouch,
    "q_stream_sessions" -> qStreamSessions,
    "q_stream_sliding" -> qStreamSliding,
  )

  val oracles: Map[String, String] = Map(
    "q_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS cnt,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,
    "q_stream_sessions" ->
      """WITH e AS (
        | SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
        |  epoch_us(ts) AS tus,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tus
        | FROM events),
        |b AS (
        | SELECT user_id, event_id, cents, tus, CASE WHEN prev_tus IS NULL
        |   OR tus - prev_tus >= 1800000000 THEN 1 ELSE 0 END AS brk
        | FROM e),
        |sess AS (
        | SELECT user_id, cents, tus,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM b)
        |SELECT user_id,
        | strftime(make_timestamp(min(tus)), '%Y-%m-%d %H:%M:%S') AS session_start,
        | strftime(make_timestamp(max(tus) + 1800000000), '%Y-%m-%d %H:%M:%S') AS session_end,
        | count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS session_c
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_first_touch" ->
      """SELECT user_id, event_type,
        | min(event_id) AS first_event_id, count(*) AS n_events
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q_stream_sliding" ->
      """WITH assigned AS (
        | SELECT date_trunc('hour', ts) - to_hours(off) AS win_start,
        |   CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events, unnest([0, 1]) AS t(off))
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        | count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS value_c
        |FROM assigned GROUP BY 1 ORDER BY win_start""".stripMargin,
  )
}
