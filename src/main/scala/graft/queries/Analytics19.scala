package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r9 batch: portable-sketch census (HLL, KMV), dyadic EWMA smoothing,
  * CDC MERGE semantics, and CUPED variance reduction — each with a
  * DuckDB oracle that replays the full computation, per the repo's
  * float discipline (integer moments, dyadic weights, fixed-order IEEE
  * ops; libm confined to one guarded ln()).
  */
object Analytics19 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Portable HyperLogLog census: per return flag, the
    * [[graft.functions.HllEstimate]] estimate of distinct part keys
    * next to the exact count — the first ORACLE-CERTIFIED cardinality
    * sketch in the registry (`q_approx_distinct`/`q_hll_union` cover
    * Spark's built-in HLL rows-only; this one's md5 registers, dyadic
    * harmonic sum, and bias correction replay cell-for-cell in DuckDB).
    *
    * 100 TB shape: m = 512 bytes of state per (group, task),
    * elementwise-max merge — the census pattern for billions of
    * distinct keys where exact countDistinct's key-sized shuffle is
    * the bottleneck (the exact column here is the referee, affordable
    * only because the testdata key domain is small). */
  val qHllPortable: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(graft.functions.HllEstimate.hllEstimate(col("l_partkey"), 9)
        .as("hll_est"),
        countDistinct(col("l_partkey")).as("exact_distinct"))
      .orderBy("l_returnflag")

  /** KMV (k-minimum-values / bottom-k) distinct estimate — the
    * zero-custom-code portable sketch: the k-th smallest DISTINCT
    * 32-bit md5 value v_k estimates cardinality as
    * (k−1)·2³² div v_k (Bar-Yossef et al. 2002), ALL integer — no
    * float anywhere, so the oracle match is exact by construction.
    *
    * 100 TB shape: distinct-hash reduce (partial-agg'd), then the
    * per-group k-th order statistic via a rank window Spark 4 plans
    * with a partial WindowGroupLimit (each task keeps k rows per group
    * before the exchange — the top-k shape, never a full sort of the
    * key domain). */
  val qKmvDistinct: Q = (s, d) => {
    val k = 64
    val hashes = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        expr("CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 8), 16, 10)" +
          " AS BIGINT)").as("h"))
      .distinct()
    val w = Window.partitionBy("l_returnflag").orderBy("h")
    hashes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col("l_returnflag"), col("h").as("v_k"),
        expr(s"(CAST(${k - 1} AS BIGINT) * 4294967296) div h").as("kmv_est"))
      .orderBy("l_returnflag")
  }

  /** Dyadic EWMA (α = 1/2, 32-lag truncation) over the daily revenue
    * series — exponential smoothing with BIT-EXACT cross-engine
    * arithmetic: weight 2^(−j−1) is dyadic, revenue is integer cents,
    * so every term and every partial sum is exactly representable and
    * the smoothed value needs NO rounding at all. Truncation at 32
    * lags bounds both the window state and the smallest denominator
    * (2³³ — still exact); rows before lag 32 are suppressed rather
    * than given edge-case semantics. The classic recursive EWMA is
    * order-dependent float accumulation — this formulation is the
    * scale-safe replacement: one sort window, O(1) state, identical
    * results on any partitioning.
    *
    * 100 TB shape: the series is the |days|-sized aggregate of the
    * fact (partial-agg'd), so the 32-lag window runs over a bounded
    * frame — never over raw rows. */
  val qEwma: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("string").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    val w = Window.orderBy("day")
    val ewma = (0 until 32).map(j =>
      coalesce(lag(col("rev_c"), j).over(w), lit(0L)).cast("double") /
        lit((1L << (j + 1)).toDouble)).reduce(_ + _)
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("ewma_c", ewma)
      .filter(col("rn") > 32)
      .select(col("day"), col("rev_c"), col("ewma_c"))
      .orderBy("day")
  }

  /** CDC MERGE (SCD Type-1 upsert/delete) — apply a changelog to reach
    * final state: each user's events, ordered by (ts, event_id), are
    * upserts carrying a value (clicks/views/purchases) or deletes
    * (errors); the surviving state is the LAST op per key when it is
    * not a delete — `MERGE INTO` semantics as one rank window + filter,
    * with the version count and last-op timestamp for audit.
    *
    * 100 TB shape: one shuffle on the merge key; the window is
    * row_number DESC with rn = 1, which Spark 4 plans as
    * WindowGroupLimit — per-task top-1 per key before the exchange, so
    * a hot key's long changelog never congregates un-reduced. */
  val qCdcMerge: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("op",
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("n_ops"),
        expr("CAST(round(value * 100) AS BIGINT)").as("final_value_c"))
      .orderBy("user_id")
  }

  /** CUPED variance reduction (Deng et al., WSDM 2013) — the A/B-test
    * readout production experimentation platforms run: per-user
    * post-period metric Y adjusted by the pre-period covariate X,
    * Y' = Y − θ(X − E[X]) with θ = cov(X,Y)/var(X) fitted POOLED, then
    * per-variant means and the variance-reduction ratio. Everything
    * derives from exact integer moments (per-user cent sums → ΣX, ΣY,
    * ΣXY, ΣX², ΣY² per variant) in fixed IEEE order, so the oracle
    * replays the identical doubles; only the final readouts round (6 dp).
    * Variants are the planted user_id parity, the pre/post split is the
    * series midpoint date.
    *
    * 100 TB shape: one user-keyed partial-agg'd reduce (the per-user
    * frame), one |variants|-row moment agg — no second pass over the
    * fact, no per-user state beyond the groupBy. */
  val qCuped: Q = (s, d) => {
    val split = Tables.events(s, d)
      .agg((min(col("ts")).cast("date") + expr("INTERVAL 4 DAYS"))
        .cast("timestamp").as("split_ts"))
    val perUser = Tables.events(s, d)
      .crossJoin(broadcast(split))
      .withColumn("v_c", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(
        sum(when(col("ts") < col("split_ts"), col("v_c")).otherwise(0L)).as("x"),
        sum(when(col("ts") >= col("split_ts"), col("v_c")).otherwise(0L)).as("y"))
    // per-variant EXACT integer moments — every downstream readout is
    // fixed-order arithmetic on these, never an avg/var over per-row
    // doubles (whose partition-order summation would diverge from the
    // oracle's)
    val mv = perUser.groupBy("variant").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val pooled = mv.agg(
      sum("n").as("pn"), sum("sx").as("psx"), sum("sy").as("psy"),
      sum("sxy").as("psxy"), sum("sxx").as("psxx"))
    val theta = pooled.select(
      ((col("psxy").cast("double") * col("pn") -
        col("psx").cast("double") * col("psy")) /
        (col("psxx").cast("double") * col("pn") -
          col("psx").cast("double") * col("psx"))).as("theta"),
      (col("psx").cast("double") / col("pn")).as("mean_x"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double")
    val sxxD = col("sxx").cast("double")
    val syyD = col("syy").cast("double")
    val t = col("theta")
    // Σ(y−θx) and Σ(y−θx)² from moments; var is shift-invariant so the
    // +θ·mean_x recentering drops out of it
    val adjSum = syD - t * sxD
    val adjSq = syyD - lit(2.0) * t * sxyD + t * t * sxxD
    mv.crossJoin(broadcast(theta))
      .select(col("variant"), col("n").as("n_users"),
        round(syD / nD, 6).as("mean_y"),
        round(syD / nD - t * (sxD / nD - col("mean_x")), 6).as("mean_y_cuped"),
        round((syyD - syD * syD / nD) / (nD - 1.0), 4).as("var_y"),
        round((adjSq - adjSum * adjSum / nD) / (nD - 1.0), 4).as("var_y_cuped"))
      .orderBy("variant")
  }

  val all: Map[String, Q] = Map(
    "q_hll_portable" -> qHllPortable,
    "q_kmv_distinct" -> qKmvDistinct,
    "q_ewma" -> qEwma,
    "q_cdc_merge" -> qCdcMerge,
    "q_cuped" -> qCuped,
  )

  private val ewmaOracle: String = {
    val terms = (0 until 32).map(j =>
      s"coalesce(lag(rev_c, $j) OVER w, 0) / ${(1L << (j + 1)).toDouble}")
      .mkString("\n   + ")
    s"""WITH daily AS (
       | SELECT CAST(o_orderdate AS VARCHAR) AS day,
       |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |    AS rev_c
       | FROM orders GROUP BY 1),
       |sm AS (
       | SELECT day, rev_c,
       |  row_number() OVER w AS rn,
       |  $terms AS ewma_c
       | FROM daily WINDOW w AS (ORDER BY day))
       |SELECT day, rev_c, ewma_c FROM sm WHERE rn > 32 ORDER BY day""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_hll_portable" ->
      """WITH h AS (
        | SELECT l_returnflag,
        |  CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT)
        |    AS h
        | FROM lineitem),
        |rr AS (
        | SELECT l_returnflag, h >> 23 AS idx,
        |  CASE WHEN (h & 8388607) = 0 THEN 24
        |       ELSE 24 - length(bin(h & 8388607)) END AS rho
        | FROM h),
        |regs AS (
        | SELECT l_returnflag, idx, max(rho) AS reg FROM rr GROUP BY 1, 2),
        |grid AS (
        | SELECT f.l_returnflag, r.i AS idx, coalesce(g.reg, 0) AS reg
        | FROM (SELECT DISTINCT l_returnflag FROM lineitem) f
        | CROSS JOIN (SELECT unnest(range(0, 512)) AS i) r
        | LEFT JOIN regs g ON g.l_returnflag = f.l_returnflag AND g.idx = r.i),
        |est AS (
        | SELECT l_returnflag,
        |  sum(1.0 / (1::BIGINT << reg)) AS s,
        |  CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
        | FROM grid GROUP BY l_returnflag),
        |raw AS (
        | SELECT l_returnflag, zeros,
        |  (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512 / s AS raw
        | FROM est)
        |SELECT r.l_returnflag,
        | round(CASE WHEN raw <= 2.5 * 512 AND zeros > 0
        |   THEN 512 * ln(512.0 / zeros) ELSE raw END, 2) AS hll_est,
        | CAST(x.ed AS BIGINT) AS exact_distinct
        |FROM raw r
        |JOIN (SELECT l_returnflag, count(DISTINCT l_partkey) AS ed
        |      FROM lineitem GROUP BY 1) x USING (l_returnflag)
        |ORDER BY r.l_returnflag""".stripMargin,
    "q_kmv_distinct" ->
      """WITH h AS (
        | SELECT DISTINCT l_returnflag,
        |  CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT)
        |    AS h
        | FROM lineitem),
        |ranked AS (
        | SELECT l_returnflag, h,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        | FROM h)
        |SELECT l_returnflag, h AS v_k,
        | CAST((63::BIGINT * 4294967296) // h AS BIGINT) AS kmv_est
        |FROM ranked WHERE rn = 64 ORDER BY l_returnflag""".stripMargin,
    "q_ewma" -> ewmaOracle,
    "q_cdc_merge" ->
      """WITH ranked AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_ops
        | FROM events)
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        | CAST(n_ops AS BIGINT) AS n_ops,
        | CAST(round(value * 100) AS BIGINT) AS final_value_c
        |FROM ranked WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin,
    "q_cuped" ->
      """WITH split AS (
        | SELECT CAST(CAST(min(ts) AS DATE) + INTERVAL 4 DAY AS TIMESTAMP)
        |   AS split_ts FROM events),
        |per_user AS (
        | SELECT user_id, user_id % 2 AS variant,
        |  CAST(sum(CASE WHEN ts < s.split_ts
        |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |  CAST(sum(CASE WHEN ts >= s.split_ts
        |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        | FROM events CROSS JOIN split s
        | GROUP BY user_id, user_id % 2, s.split_ts),
        |mv AS (
        | SELECT variant, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
        | FROM per_user GROUP BY variant),
        |pooled AS (
        | SELECT CAST(sum(n) AS BIGINT) AS pn, CAST(sum(sx) AS BIGINT) AS psx,
        |  CAST(sum(sy) AS BIGINT) AS psy, CAST(sum(sxy) AS BIGINT) AS psxy,
        |  CAST(sum(sxx) AS BIGINT) AS psxx
        | FROM mv),
        |theta AS (
        | SELECT (CAST(psxy AS DOUBLE) * pn - CAST(psx AS DOUBLE) * psy)
        |   / (CAST(psxx AS DOUBLE) * pn - CAST(psx AS DOUBLE) * psx) AS theta,
        |  CAST(psx AS DOUBLE) / pn AS mean_x
        | FROM pooled)
        |SELECT variant, n AS n_users,
        | round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_y,
        | round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |   - t.theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - t.mean_x), 6)
        |   AS mean_y_cuped,
        | round((CAST(syy AS DOUBLE)
        |   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |   / (CAST(n AS DOUBLE) - 1.0), 4) AS var_y,
        | round(((CAST(syy AS DOUBLE) - 2.0 * t.theta * CAST(sxy AS DOUBLE)
        |     + t.theta * t.theta * CAST(sxx AS DOUBLE))
        |   - (CAST(sy AS DOUBLE) - t.theta * CAST(sx AS DOUBLE))
        |     * (CAST(sy AS DOUBLE) - t.theta * CAST(sx AS DOUBLE))
        |     / CAST(n AS DOUBLE))
        |   / (CAST(n AS DOUBLE) - 1.0), 4) AS var_y_cuped
        |FROM mv CROSS JOIN theta t ORDER BY variant""".stripMargin,
  )
}
