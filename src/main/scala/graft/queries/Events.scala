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

  /** Time-series resample + forward fill: hourly purchase averages on a
    * COMPLETE hour spine (gap hours materialized with n=0), gaps filled
    * with the last observed value — the resampling pass every
    * time-series feature pipeline runs before a model sees the data.
    * The spine comes from one 1-row min/max aggregate exploded through
    * `sequence` (no driver round-trip); the forward-fill window is
    * unpartitioned but runs over spine rows — bounded by the TIME SPAN
    * (720/month), never by data volume.
    *
    * The filled average is EXACT INTEGER ARITHMETIC end to end: with
    * ~3 values per hour, a float `avg` lands on decimal rounding
    * midpoints where the engines systematically split (Spark `round`
    * HALF_UPs the shortest decimal string, DuckDB rounds the binary
    * double — observed 59.07 vs 59.08, then 39.25 vs 39.24 even with a
    * bit-identical quotient). So: `round(value*100)` → exact cents,
    * summed exactly, and the per-hour average is floored MILLI-units
    * ((cents·10) div n) — integers only, nothing to round, nothing to
    * diverge. */
  val qResampleFfill: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val hourly = ev.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("avg_milli", expr("(cents * 10) div n"))
      .drop("cents")
    val spine = ev
      .agg(date_trunc("hour", min("ts")).as("lo"),
        date_trunc("hour", max("ts")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("hour"))
    val w = Window.orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("hour"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("filled", last(col("avg_milli"), ignoreNulls = true).over(w))
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("n"),
        col("filled"),
        (col("n") === 0L).cast("long").as("was_gap"))
      .orderBy("hour")
  }

  /** Windowed conversion rate: of each day's signup cohort, who made a
    * purchase within 24 HOURS of their first signup — the
    * time-constrained funnel metric (distinct from q_funnel's
    * unconstrained ordering and q_retention_cohorts' day-grain
    * activity). All comparisons in exact MICROSECONDS
    * (`unix_micros`/`epoch_us` — no truncation ambiguity at window
    * edges); the rate is one long/long division, bit-exact. The
    * purchase join is collapsed per user BEFORE the cohort rollup. */
  val qConversion24h: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    val perUser = signups
      .withColumn("s_us", unix_micros(col("signup_ts")))
      .join(purchases, Seq("user_id"), "left")
      .groupBy("user_id", "signup_ts")
      .agg(max(when(col("p_us").isNotNull &&
        col("p_us") >= col("s_us") &&
        col("p_us") - col("s_us") < lit(86400L * 1000000L), 1L)
        .otherwise(0L)).as("conv"))
    perUser
      .groupBy(date_trunc("day", col("signup_ts")).as("cohort_day"))
      .agg(count(lit(1)).as("n_users"), sum("conv").as("n_converted"))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        col("n_users"), col("n_converted"),
        (col("n_converted") / col("n_users")).as("conv_rate"))
      .orderBy("cohort")
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current event type). The sequence model under
    * user-journey analysis and next-action prediction features. One
    * user_id-keyed window (lead) then a transition-keyed count; the
    * probability is long/long on the from-type marginal — a ratio of
    * exact integers, bit-identical cross-engine. Ties in ts are broken
    * by the unique event_id on both sides, so the lead() sequence is
    * deterministic. Scale: the shuffle is keyed by user then by the
    * (|types|²)-bounded transition pair — state never exceeds the type
    * vocabulary squared. */
  val qMarkovTransitions: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val wFrom = Window.partitionBy("from_type")
    trans
      .withColumn("p_trans", col("n_trans") / sum("n_trans").over(wFrom))
      .select("from_type", "to_type", "n_trans", "p_trans")
      .orderBy("from_type", "to_type")
  }

  /** Rolling engagement: DAU, trailing-7-day distinct actives (WAU), and
    * the DAU/WAU stickiness ratio per day. The rolling DISTINCT count —
    * which no window frame can express (count_distinct isn't a window
    * aggregate) — is computed by CONTRIBUTION EXPANSION: each (user,
    * day) row is exploded to the ≤7 report days it participates in,
    * then it's a plain countDistinct per day — an equi-shuffle bounded
    * by 7×|user-days|, no inequality join, no day² loop. The ratio is
    * long/long, bit-exact cross-engine (the oracle replays the window
    * with an interval-range join). */
  val qRollingDau: Q = (s, d) => {
    val userDays = Tables.events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val daily = userDays.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select(col("user_id"), explode(sequence(col("day"),
        col("day") + expr("interval 6 days"), expr("interval 1 day"))).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau7"))
    daily.join(wau, "day")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau7"),
        (col("dau") / col("wau7")).as("stickiness"))
      .orderBy("day")
  }

  /** Longest consecutive-day activity streak — the gaps-and-islands
    * pattern: within each user's distinct active days, day − row_number
    * is CONSTANT across a consecutive run (both step by one), so
    * grouping on that anchor splits runs without self-joins or
    * iterative logic. The anchor is an exact integer (day-diff from a
    * fixed epoch minus rn), one user-keyed window + two aggregates;
    * output is the streak-length histogram, bounded by the calendar. */
  val qMaxStreak: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val streaks = ud
      .withColumn("anchor",
        datediff(col("day"), lit("2024-01-01").cast("date")).cast("long") -
          row_number().over(w))
      .groupBy("user_id", "anchor").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("max_streak"))
    streaks.groupBy("max_streak").agg(count(lit(1)).as("n_users"))
      .orderBy("max_streak")
  }

  /** Exponentially-decayed hourly revenue (half-life = 1 h, horizon 10):
    * decayed(h) = Σ_{d=0..9} cents(h−d) div 2^{d+1} — the recency-
    * weighted activity signal. Sequential EWMA recursion doesn't
    * distribute (and window frames can't vary a coefficient by offset),
    * so this uses CONTRIBUTION EXPANSION again: each hour's total
    * explodes to the 10 future hours it decays into, each with its own
    * integer shift, then one hour-keyed sum. Truncation (÷2¹⁰ ≈ 0.1%)
    * buys exact integer arithmetic end to end — floor-div per term is
    * part of the operator's definition, replayed identically by the
    * oracle. Shuffle bounded by 10×|hours|. */
  val qDecayedSum: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("h_us", unix_micros(col("hour")))
    val decayed = hourly
      .select(col("h_us"), col("cents"),
        explode(sequence(lit(0), lit(9))).as("d"))
      .select((col("h_us") + col("d").cast("long") * lit(3600000000L)).as("h_us"),
        expr("cents div shiftleft(2L, d)").as("part"))
      .groupBy("h_us").agg(sum("part").as("decayed_cents"))
    hourly.join(decayed, Seq("h_us"))
      .select(
        date_format(timestamp_micros(col("h_us")), "yyyy-MM-dd HH:00:00").as("hour"),
        col("cents"), col("decayed_cents"))
      .orderBy("hour")
  }

  /** Peak-preserving time-series downsampling — the dashboard/monitoring
    * reducer that keeps anomalies a plain per-bucket average would
    * erase: per hour, keep the single purchase FARTHEST from the
    * bucket's own mean. The deviation compare is cross-multiplied into
    * integers (|cents·n − Σcents| — the exact milli-unit discipline),
    * argmax via rank-1 over (dev desc, ts, event_id) which plans as a
    * partial WindowGroupLimit: each task keeps one candidate per hour
    * before the exchange. One agg + one equi-join on hour; never a
    * global sort of the raw points. */
  val qDownsamplePeak: Q = (s, d) => {
    val pts = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_trunc("hour", col("ts")).as("hour"),
        col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val stats = pts.groupBy("hour")
      .agg(sum("cents").as("s"), count(lit(1)).as("n"))
    val w = Window.partitionBy("hour")
      .orderBy(desc("dev"), asc("ts"), asc("event_id"))
    pts.join(stats, "hour")
      .withColumn("dev", abs(col("cents") * col("n") - col("s")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:00:00").as("hour"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("peak_ts"),
        col("event_id"), col("cents"), col("n").as("n_pts"),
        col("dev").as("dev_scaled"))
      .orderBy("hour")
  }

  /** Hourly p50/p95 value bands — the SLO/latency-dashboard shape, as
    * DATUM-VALUED (type-1) quantiles: the value at rank ⌈p·n⌉ of the
    * bucket's sorted points, rank computed in integers ((n·p + 99) div
    * 100) so there is no interpolation and no float anywhere — selection
    * by row_number over the per-hour sort (spillable; the
    * [[graft.operators.Percentiles]] idiom applied per time bucket),
    * then one conditional agg collapses both ranks in a single pass.
    * Two shuffles on hour (count + window), both \|hours\|-keyed. */
  val qHourlyQuantiles: Q = (s, d) => {
    val pts = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(date_trunc("hour", col("ts")).as("hour"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
    val n = pts.groupBy("hour").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("hour").orderBy(asc("cents"), asc("event_id"))
    pts.join(n, "hour")
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy("hour")
      .agg(max("n").as("n_pts"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("cents")))
          .as("p50_cents"),
        max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("cents")))
          .as("p95_cents"))
      .select(date_format(col("hour"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("n_pts"), col("p50_cents"), col("p95_cents"))
      .orderBy("hour")
  }

  /** Event debouncing / rate limiting — the ingestion throttle that
    * keeps only the FIRST event per (user, 5-minute window) and reports
    * how much each noisy user was suppressed. The keeper is
    * min(struct(ts, event_id)) per (user, bucket) — ONE partial-
    * aggregable hash-agg, no window, no sort: each task reduces its own
    * events to one count per (user, bucket) before the shuffle, so
    * shuffle volume is bounded by active (user, bucket) pairs, not
    * events. Bucketing is integer floor-div on epoch micros; the
    * suppression ratio is floored milli-units — exact end to end. */
  val qDebounce: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 300000000").as("bucket"))
    ev.groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(sum("n").as("n_events"),
        count(lit(1)).as("n_kept"),
        (sum("n") - count(lit(1))).as("n_suppressed"))
      .withColumn("suppressed_milli",
        expr("(n_suppressed * 1000L) div n_events"))
      .filter(col("user_id") < 100)
      .orderBy("user_id")
  }

  /** Funnel-latency distribution — signup→first-purchase time-to-convert
    * at p50/p90/p99, datum-valued in exact integer MICROSECONDS. The
    * global quantile needs a corpus-wide rank, which is the
    * single-partition-window trap; instead [[graft.operators.Scale
    * .denseIds]] assigns contiguous global positions over the
    * range-partitioned duration sort (the q_shard_assign enumeration
    * applied to order statistics), and one conditional agg picks the
    * three ⌈p·n⌉ ranks. No window ever sees more than one partition's
    * rows. */
  val qFunnelLatency: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t_s"))
    val durs = ev.filter(col("event_type") === "purchase")
      .join(su, "user_id").filter(col("ts") >= col("t_s"))
      .groupBy("user_id")
      .agg((unix_micros(min(col("ts"))) - unix_micros(min(col("t_s"))))
        .as("dur_us"))
    val n = durs.agg(count(lit(1)).as("n"))
    graft.operators.Scale.denseIds(durs, "pos", Seq("dur_us", "user_id"))
      .crossJoin(n)
      .agg(max("n").as("n_converted"),
        max(when(col("pos") === expr("(n * 50 + 99) div 100"), col("dur_us")))
          .as("p50_us"),
        max(when(col("pos") === expr("(n * 90 + 99) div 100"), col("dur_us")))
          .as("p90_us"),
        max(when(col("pos") === expr("(n * 99 + 99) div 100"), col("dur_us")))
          .as("p99_us"))
  }

  /** Running total with RESETS — the balance/meter pattern ("revenue
    * since last signup") that a plain cumsum can't express: the reset
    * segments come from a cumulative count of reset markers (the
    * sessionize idiom with an event-type predicate), then the running
    * sum restarts per (user, segment). Both windows share the one
    * user-keyed shuffle; integer cents end to end. */
  val qRunningReset: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("signup", "purchase") && col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
      .withColumn("seg",
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).over(byUser))
    val bySeg = Window.partitionBy("user_id", "seg")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("run_cents", sum("cents").over(bySeg))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("seg"), col("cents"), col("run_cents"))
      .orderBy("user_id", "event_id")
  }

  /** Hourly event-rate anomalies: hours whose event count sits more than
    * 2σ from the overall hourly mean. The ops-side drift alarm over an
    * ingest stream — a collection outage or a bot flood shows up as an
    * anomalous hour before it shows up in model metrics.
    *
    * 100 TB shape: ONE hour-keyed hash-agg (map-side combined), then the
    * moment agg and z threshold run on the hour series — O(hours) rows —
    * via a 1-row broadcast. Integer counts make the mean exact; mu/sigma
    * are rounded 4dp on both engines before the threshold compare. */
  val qRateAnomaly: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val st = hourly.agg(round(avg("cnt"), 4).as("mu"),
      round(stddev_samp("cnt"), 4).as("sigma"))
    hourly.crossJoin(st) // 1-row aggregate broadcast
      .withColumn("z", round((col("cnt") - col("mu")) / col("sigma"), 4))
      .filter(abs(col("z")) > 2.0)
      .select(col("hour"), col("cnt"), col("z"))
      .orderBy("hour")
  }

  /** CDC changelog → snapshot: replay the event log as entity operations
    * (signup = insert, error = delete, purchase = balance credit) and
    * materialize the LIVE account state — alive iff the last signup
    * postdates the last error, balance = purchases since that signup.
    * The batch form of applying an upsert/delete stream to a table.
    *
    * 100 TB shape: one user-keyed hash-agg derives the entity lifecycle
    * (last signup/error) as conditional aggregates, then the SURVIVORS
    * join the purchase slice on user_id — both sides pre-filtered, no
    * window, no per-user collect (a collect_list variant would
    * materialize per-user event lists, unbounded under skew); integer
    * cents end to end. */
  val qCdcSnapshot: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        unix_micros(col("ts")).as("us"))
    ev.groupBy("user_id")
      .agg(
        max(when(col("event_type") === "signup", col("us"))).as("last_signup"),
        max(when(col("event_type") === "error", col("us"))).as("last_error"))
      .filter(col("last_signup").isNotNull &&
        (col("last_error").isNull || col("last_error") < col("last_signup")))
      .join(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), col("cents")), Seq("user_id"), "left")
      .withColumn("counted",
        when(col("us") > col("last_signup"), lit(1L)).otherwise(lit(0L)))
      .groupBy("user_id", "last_signup")
      .agg(sum("counted").as("n_purchases"),
        coalesce(sum(when(col("counted") === 1L, col("cents"))), lit(0L))
          .as("balance_cents"))
      .select(col("user_id"), col("n_purchases"), col("balance_cents"))
      .orderBy("user_id")
  }

  val all: Map[String, Q] = Map(
    "q_cdc_snapshot" -> qCdcSnapshot,
    "q_rate_anomaly" -> qRateAnomaly,
    "q_concurrency" -> qConcurrency,
    "q_retention_cohorts" -> qRetentionCohorts,
    "q_resample_ffill" -> qResampleFfill,
    "q_conversion_24h" -> qConversion24h,
    "q_markov_transitions" -> qMarkovTransitions,
    "q_rolling_dau" -> qRollingDau,
    "q_max_streak" -> qMaxStreak,
    "q_decayed_sum" -> qDecayedSum,
    "q_downsample_peak" -> qDownsamplePeak,
    "q_hourly_quantiles" -> qHourlyQuantiles,
    "q_debounce" -> qDebounce,
    "q_funnel_latency" -> qFunnelLatency,
    "q_running_reset" -> qRunningReset,
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
    "q_cdc_snapshot" ->
      """WITH ev AS (
        | SELECT user_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS cents, epoch_us(ts) AS us
        | FROM events),
        |life AS (
        | SELECT user_id,
        |  max(CASE WHEN event_type = 'signup' THEN us END) AS last_signup,
        |  max(CASE WHEN event_type = 'error' THEN us END) AS last_error
        | FROM ev GROUP BY user_id),
        |alive AS (
        | SELECT user_id, last_signup FROM life
        | WHERE last_signup IS NOT NULL
        |   AND (last_error IS NULL OR last_error < last_signup))
        |SELECT a.user_id,
        | CAST(coalesce(sum(CASE WHEN p.us > a.last_signup THEN 1 END), 0)
        |   AS BIGINT) AS n_purchases,
        | CAST(coalesce(sum(CASE WHEN p.us > a.last_signup THEN p.cents END), 0)
        |   AS BIGINT) AS balance_cents
        |FROM alive a LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
        |  ON a.user_id = p.user_id
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q_rate_anomaly" ->
      """WITH h AS (
        | SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |  count(*) AS cnt
        | FROM events GROUP BY 1),
        |st AS (SELECT round(avg(cnt), 4) AS mu,
        |        round(stddev_samp(cnt), 4) AS sigma FROM h)
        |SELECT hour, cnt, round((cnt - mu) / sigma, 4) AS z
        |FROM h, st
        |WHERE abs(round((cnt - mu) / sigma, 4)) > 2.0
        |ORDER BY hour""".stripMargin,
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
    "q_resample_ffill" ->
      """WITH p AS (
        | SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
        |  (sum(CAST(round(value*100) AS BIGINT)) * 10) // count(*)
        |    AS avg_milli
        | FROM events WHERE event_type = 'purchase' GROUP BY hour),
        |span AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |   date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |   AS hour FROM span),
        |j AS (SELECT s.hour, coalesce(p.n, 0) AS n, p.avg_milli
        |      FROM spine s LEFT JOIN p USING (hour))
        |SELECT strftime(hour, '%Y-%m-%d %H:00:00') AS hour,
        | CAST(n AS BIGINT) AS n,
        | CAST(last_value(avg_milli IGNORE NULLS) OVER (ORDER BY hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS filled,
        | CAST(CASE WHEN n = 0 THEN 1 ELSE 0 END AS BIGINT) AS was_gap
        |FROM j ORDER BY hour""".stripMargin,
    "q_conversion_24h" ->
      """WITH s AS (
        | SELECT user_id, min(ts) AS signup_ts
        | FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (SELECT user_id, epoch_us(ts) AS p_us
        |      FROM events WHERE event_type = 'purchase'),
        |u AS (
        | SELECT s.user_id, s.signup_ts,
        |  max(CASE WHEN p.p_us IS NOT NULL
        |        AND p.p_us >= epoch_us(s.signup_ts)
        |        AND p.p_us - epoch_us(s.signup_ts) < 86400000000
        |       THEN 1 ELSE 0 END) AS conv
        | FROM s LEFT JOIN p USING (user_id)
        | GROUP BY s.user_id, s.signup_ts)
        |SELECT strftime(date_trunc('day', signup_ts), '%Y-%m-%d') AS cohort,
        | count(*) AS n_users,
        | CAST(sum(conv) AS BIGINT) AS n_converted,
        | CAST(sum(conv) AS BIGINT) / count(*) AS conv_rate
        |FROM u GROUP BY cohort ORDER BY cohort""".stripMargin,
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
    "q_markov_transitions" ->
      """WITH t AS (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   AS to_type
        | FROM events),
        |c AS (
        | SELECT from_type, to_type, count(*) AS n_trans
        | FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
        | CAST(n_trans AS BIGINT) /
        |  CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS p_trans
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q_rolling_dau" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |days AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |w AS (
        | SELECT d.day, count(DISTINCT u.user_id) AS wau7
        | FROM days d JOIN ud u
        |   ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        | GROUP BY d.day)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau,
        | CAST(w.wau7 AS BIGINT) AS wau7,
        | d.dau / CAST(w.wau7 AS BIGINT) AS stickiness
        |FROM days d JOIN w USING (day) ORDER BY day""".stripMargin,
    "q_max_streak" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |runs AS (
        | SELECT user_id,
        |  date_diff('day', DATE '2024-01-01', day) -
        |   row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
        | FROM ud),
        |lens AS (
        | SELECT user_id, count(*) AS len
        | FROM runs GROUP BY user_id, anchor),
        |mx AS (SELECT user_id, max(len) AS max_streak FROM lens GROUP BY user_id)
        |SELECT CAST(max_streak AS BIGINT) AS max_streak,
        | count(*) AS n_users
        |FROM mx GROUP BY max_streak ORDER BY max_streak""".stripMargin,
    "q_decayed_sum" ->
      """WITH hourly AS (
        | SELECT date_trunc('hour', ts) AS hour,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |h2 AS (SELECT epoch_us(hour) AS h_us, cents FROM hourly),
        |c AS (
        | SELECT h_us + d * 3600000000 AS h_us,
        |  cents // (CAST(2 AS BIGINT) << d) AS part
        | FROM h2, generate_series(0, 9) AS t(d)),
        |dec AS (
        | SELECT h_us, CAST(sum(part) AS BIGINT) AS decayed_cents
        | FROM c GROUP BY h_us)
        |SELECT strftime(make_timestamp(h2.h_us), '%Y-%m-%d %H:00:00') AS hour,
        | h2.cents, dec.decayed_cents
        |FROM h2 JOIN dec USING (h_us) ORDER BY hour""".stripMargin,
    "q_downsample_peak" ->
      """WITH pts AS (
        | SELECT date_trunc('hour', ts) AS hour, ts, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events WHERE event_type = 'purchase'),
        |st AS (
        | SELECT hour, CAST(sum(cents) AS BIGINT) AS s,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM pts GROUP BY hour),
        |dv AS (
        | SELECT p.hour, p.ts, p.event_id, p.cents, st.n,
        |  abs(p.cents * st.n - st.s) AS dev,
        |  row_number() OVER (PARTITION BY p.hour
        |    ORDER BY abs(p.cents * st.n - st.s) DESC, p.ts, p.event_id) AS rk
        | FROM pts p JOIN st USING (hour))
        |SELECT strftime(hour, '%Y-%m-%d %H:00:00') AS hour,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS peak_ts,
        | event_id, cents, n AS n_pts, CAST(dev AS BIGINT) AS dev_scaled
        |FROM dv WHERE rk = 1 ORDER BY hour""".stripMargin,
    "q_hourly_quantiles" ->
      """WITH pts AS (
        | SELECT date_trunc('hour', ts) AS hour,
        |  CAST(round(value * 100) AS BIGINT) AS cents, event_id
        | FROM events WHERE event_type = 'purchase'),
        |n AS (SELECT hour, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY hour),
        |r AS (
        | SELECT p.hour, p.cents, n.n,
        |  row_number() OVER (PARTITION BY p.hour
        |                     ORDER BY p.cents, p.event_id) AS rn
        | FROM pts p JOIN n USING (hour))
        |SELECT strftime(hour, '%Y-%m-%d %H:00:00') AS hour,
        | max(n) AS n_pts,
        | CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END) AS BIGINT) AS p50_cents,
        | CAST(max(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS BIGINT) AS p95_cents
        |FROM r GROUP BY hour ORDER BY hour""".stripMargin,
    "q_debounce" ->
      """WITH b AS (
        | SELECT user_id, epoch_us(ts) // 300000000 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |u AS (
        | SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n) - count(*) AS BIGINT) AS n_suppressed
        | FROM b GROUP BY user_id)
        |SELECT user_id, n_events, n_kept, n_suppressed,
        | (n_suppressed * 1000) // n_events AS suppressed_milli
        |FROM u WHERE user_id < 100 ORDER BY user_id""".stripMargin,
    "q_funnel_latency" ->
      """WITH su AS (
        | SELECT user_id, min(ts) AS t_s FROM events
        | WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        | SELECT e.user_id,
        |  min(epoch_us(e.ts)) - min(epoch_us(su.t_s)) AS dur_us
        | FROM events e JOIN su USING (user_id)
        | WHERE e.event_type = 'purchase'
        |  AND epoch_us(e.ts) >= epoch_us(su.t_s)
        | GROUP BY e.user_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
        |r AS (
        | SELECT dur_us,
        |  row_number() OVER (ORDER BY dur_us, user_id) AS pos
        | FROM p)
        |SELECT max(n.n) AS n_converted,
        | CAST(max(CASE WHEN pos = (n * 50 + 99) // 100 THEN dur_us END) AS BIGINT) AS p50_us,
        | CAST(max(CASE WHEN pos = (n * 90 + 99) // 100 THEN dur_us END) AS BIGINT) AS p90_us,
        | CAST(max(CASE WHEN pos = (n * 99 + 99) // 100 THEN dur_us END) AS BIGINT) AS p99_us
        |FROM r CROSS JOIN n""".stripMargin,
    "q_running_reset" ->
      """WITH ev AS (
        | SELECT user_id, event_id, ts, event_type,
        |  CASE WHEN event_type = 'purchase'
        |   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
        | FROM events
        | WHERE event_type IN ('signup', 'purchase') AND user_id < 20),
        |seg AS (
        | SELECT *, CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
        | FROM ev),
        |run AS (
        | SELECT *, CAST(sum(cents)
        |   OVER (PARTITION BY user_id, seg ORDER BY ts, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        | FROM seg)
        |SELECT user_id, event_id,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, seg, cents, run_cents
        |FROM run WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
