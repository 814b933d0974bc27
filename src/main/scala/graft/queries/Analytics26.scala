package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 8: time-series risk, population estimation, and paired /
  * rank association tests — exact-integer interiors throughout; the two
  * float readouts (Kendall τ) follow the fixed-order
  * integers→double→round-6dp discipline the statistics batch
  * standardized, so both engines evaluate the identical IEEE tree.
  */
object Analytics26 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  private val revC = expr("CAST(round(o_totalprice * 100) AS BIGINT)")

  /** Maximum drawdown of each nation's cumulative order revenue — the
    * peak-to-trough risk readout a revenue-ops dashboard tracks. The
    * running peak and the cumulative sum are both integer cents under a
    * per-nation day-ordered window; the reported trough day is the FIRST
    * day attaining the max drawdown (deterministic tiebreak).
    *
    * 100 TB shape: revenue collapses to the bounded (nation × day)
    * frame before any window; the windows then run inside 25 small
    * partitions — no global sort, no driver state. */
  val qMaxDrawdown: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").cast("date").cast("string").as("day"))
      .agg(sum(revC).as("rev_c"))
    val w = Window.partitionBy("n_name").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily
      .withColumn("cum", sum(col("rev_c")).over(w))
      .withColumn("peak", max(col("cum")).over(w))
      .withColumn("dd", col("peak") - col("cum"))
    dd.withColumn("mx", max(col("dd")).over(Window.partitionBy("n_name")))
      .filter(col("dd") === col("mx"))
      .groupBy("n_name")
      .agg(max(col("mx")).as("max_drawdown_c"), min(col("day")).as("trough_day"))
      .orderBy("n_name")
  }

  /** Capture–recapture population estimate (Chapman's bias-corrected
    * Lincoln–Petersen, Chapman 1951): treat even and odd epoch-days of
    * the event stream as the two capture occasions and estimate the
    * total user population from the overlap — the coverage readout a
    * crawl/telemetry owner uses to ask "how many users exist that we
    * have NOT seen yet". N̂ = (n₁+1)(n₂+1) div (m+1) − 1, all integer;
    * coverage_ppm = seen·10⁶ div N̂.
    *
    * 100 TB shape: one per-user boolean reduce, then a 1-row census. */
  val qCaptureRecapture: Q = (s, d) => {
    val occ = Tables.events(s, d)
      .select(col("user_id"),
        (expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)") % 2)
          .as("occ"))
    val perUser = occ.groupBy("user_id")
      .agg(max((col("occ") === 0).cast("long")).as("in_a"),
        max((col("occ") === 1).cast("long")).as("in_b"))
    perUser.agg(
        sum(col("in_a")).as("n_a"), sum(col("in_b")).as("n_b"),
        sum(col("in_a") * col("in_b")).as("m"),
        count(lit(1)).as("n_seen"))
      .select(col("n_a"), col("n_b"), col("m"), col("n_seen"),
        expr("((n_a + 1) * (n_b + 1)) div (m + 1) - 1").as("n_hat"),
        expr("(n_seen * 1000000) div (((n_a + 1) * (n_b + 1)) div (m + 1) - 1)")
          .as("coverage_ppm"))
  }

  /** McNemar's paired test: is a user's weekday activity status
    * associated with their weekend activity status? The paired-binary
    * 2×2 uses only the DISCORDANT cells — stat = (b−c)²/(b+c), kept
    * exact as ppm integers, with the χ²₁ 95% call at 3.841459. Weekday
    * from the engine-neutral Monday-anchored (epoch_day+3) mod 7 (the
    * q_calendar_dim discipline — never engine dayofweek()).
    *
    * 100 TB shape: per-user boolean reduce, then a 3-cell census. */
  val qMcnemar: Q = (s, d) => {
    val wd = Tables.events(s, d)
      .select(col("user_id"),
        expr("(CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT) + 3) % 7")
          .as("wd"))
    val perUser = wd.groupBy("user_id")
      .agg(max((col("wd") < 5).cast("long")).as("on_wk"),
        max((col("wd") >= 5).cast("long")).as("on_we"))
    perUser.agg(
        sum(col("on_wk") * col("on_we")).as("n_both"),
        sum(expr("CAST(on_wk = 1 AND on_we = 0 AS BIGINT)")).as("b"),
        sum(expr("CAST(on_wk = 0 AND on_we = 1 AS BIGINT)")).as("c"))
      .select(col("n_both"), col("b"), col("c"),
        expr("CASE WHEN b + c = 0 THEN 0 ELSE ((b - c) * (b - c) * 1000000) div (b + c) END")
          .as("stat_ppm"),
        expr("""CAST(CASE WHEN b + c = 0 THEN 0
                ELSE ((b - c) * (b - c) * 1000000) div (b + c) END > 3841459 AS BIGINT)""")
          .as("significant"))
  }

  /** Kendall's τ-b between daily order count and daily revenue — the
    * rank-association companion to q_spearman that is robust to the
    * monotone-transform choice. Concordant/discordant/tie counts are
    * exact integers from the bounded |days|² pair frame (the q_theil_sen
    * non-equi-join shape — pairwise cost is |days|², INDEPENDENT of row
    * count); the single float step is the fixed-order
    * (C−D)/√(n₀−t_x)/√(n₀−t_y) on exact integers, rounded to the 6dp
    * grid both engines share.
    *
    * 100 TB shape: one partial-agg'd collapse to ≤|days| rows, one
    * bounded pair join, three 1-row broadcast census frames. */
  val qKendallTau: Q = (s, d) => {
    val sgn = (a: Column, b: Column) =>
      when(a > b, lit(1L)).when(a < b, lit(-1L)).otherwise(lit(0L))
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"), sum(revC).as("y"))
      .withColumn("i", expr("CAST(datediff(day, DATE '1992-01-01') AS BIGINT)"))
    val pairs = daily.as("a").join(daily.as("b"), col("a.i") < col("b.i"))
      .select(sgn(col("a.x"), col("b.x")).as("sx"),
        sgn(col("a.y"), col("b.y")).as("sy"))
    val cd = pairs.agg(
      sum((col("sx") * col("sy") === 1).cast("long")).as("conc"),
      sum((col("sx") * col("sy") === -1).cast("long")).as("disc"))
    val n = daily.agg(count(lit(1)).as("n"))
    val tx = daily.groupBy("x").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("tx"))
    val ty = daily.groupBy("y").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("ty"))
    cd.crossJoin(broadcast(n)).crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("conc"), col("disc"),
        expr("n * (n - 1) div 2").as("n0"), col("tx"), col("ty"),
        round(expr("CAST(conc - disc AS DOUBLE)") /
          sqrt(expr("CAST(n * (n - 1) div 2 - tx AS DOUBLE)")) /
          sqrt(expr("CAST(n * (n - 1) div 2 - ty AS DOUBLE)")), 6).as("tau_b"))
  }

  val all: Map[String, Q] = Map(
    "q_max_drawdown" -> qMaxDrawdown,
    "q_capture_recapture" -> qCaptureRecapture,
    "q_mcnemar" -> qMcnemar,
    "q_kendall_tau" -> qKendallTau,
  )

  val oracles: Map[String, String] = Map(
    "q_max_drawdown" ->
      """WITH daily AS (
        | SELECT n.n_name, CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS day,
        |   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders o
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | GROUP BY 1, 2),
        |dd AS (
        | SELECT n_name, day,
        |   max(sum_cum) OVER (PARTITION BY n_name ORDER BY day
        |     ROWS UNBOUNDED PRECEDING) - sum_cum AS dd
        | FROM (
        |  SELECT n_name, day,
        |    sum(rev_c) OVER (PARTITION BY n_name ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS sum_cum
        |  FROM daily)),
        |mx AS (
        | SELECT n_name, day, dd, max(dd) OVER (PARTITION BY n_name) AS mx
        | FROM dd)
        |SELECT n_name, CAST(max(mx) AS BIGINT) AS max_drawdown_c,
        | min(day) AS trough_day
        |FROM mx WHERE dd = mx GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_capture_recapture" ->
      """WITH per_user AS (
        | SELECT user_id,
        |  max(CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 2 = 0
        |      THEN 1 ELSE 0 END) AS in_a,
        |  max(CASE WHEN date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 2 = 1
        |      THEN 1 ELSE 0 END) AS in_b
        | FROM events GROUP BY user_id),
        |cells AS (
        | SELECT CAST(sum(in_a) AS BIGINT) AS n_a, CAST(sum(in_b) AS BIGINT) AS n_b,
        |  CAST(sum(in_a * in_b) AS BIGINT) AS m, count(*) AS n_seen
        | FROM per_user)
        |SELECT n_a, n_b, m, n_seen,
        | CAST(((n_a + 1) * (n_b + 1)) // (m + 1) - 1 AS BIGINT) AS n_hat,
        | CAST((n_seen * 1000000) // (((n_a + 1) * (n_b + 1)) // (m + 1) - 1)
        |   AS BIGINT) AS coverage_ppm
        |FROM cells""".stripMargin,
    "q_mcnemar" ->
      """WITH per_user AS (
        | SELECT user_id,
        |  max(CASE WHEN (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 < 5
        |      THEN 1 ELSE 0 END) AS on_wk,
        |  max(CASE WHEN (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 >= 5
        |      THEN 1 ELSE 0 END) AS on_we
        | FROM events GROUP BY user_id),
        |cells AS (
        | SELECT CAST(sum(on_wk * on_we) AS BIGINT) AS n_both,
        |  CAST(sum(CASE WHEN on_wk = 1 AND on_we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN on_wk = 0 AND on_we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
        | FROM per_user)
        |SELECT n_both, b, c,
        | CAST(CASE WHEN b + c = 0 THEN 0
        |   ELSE ((b - c) * (b - c) * 1000000) // (b + c) END AS BIGINT) AS stat_ppm,
        | CAST(CASE WHEN b + c = 0 THEN 0
        |   ELSE ((b - c) * (b - c) * 1000000) // (b + c) END > 3841459 AS BIGINT)
        |   AS significant
        |FROM cells""".stripMargin,
    "q_kendall_tau" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y,
        |   date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS i
        | FROM orders GROUP BY 1),
        |pairs AS (
        | SELECT CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1 ELSE 0 END AS sx,
        |        CASE WHEN a.y > b.y THEN 1 WHEN a.y < b.y THEN -1 ELSE 0 END AS sy
        | FROM daily a JOIN daily b ON a.i < b.i),
        |cd AS (
        | SELECT CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        |        CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS disc
        | FROM pairs),
        |nn AS (SELECT count(*) AS n FROM daily),
        |txx AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS tx
        |        FROM (SELECT count(*) AS c FROM daily GROUP BY x)),
        |tyy AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS ty
        |        FROM (SELECT count(*) AS c FROM daily GROUP BY y))
        |SELECT conc, disc, CAST(n * (n - 1) // 2 AS BIGINT) AS n0, tx, ty,
        | round(CAST(conc - disc AS DOUBLE)
        |   / sqrt(CAST(n * (n - 1) // 2 - tx AS DOUBLE))
        |   / sqrt(CAST(n * (n - 1) // 2 - ty AS DOUBLE)), 6) AS tau_b
        |FROM cd, nn, txx, tyy""".stripMargin,
  )
}
