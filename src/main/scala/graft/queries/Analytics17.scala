package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r8 tail batch 4 — corpus-mixing and sequence-statistics completion:
  * exact largest-remainder quota apportionment (the integer answer to
  * "allocate N sample slots proportionally"), greedy token-budget
  * fill, the Wald–Wolfowitz runs test, and a seasonal-naive forecast
  * backtest. All integer arithmetic except the runs-test z (fixed-order
  * doubles from exact integers, 6dp).
  */
object Analytics17 {
  type Q = (SparkSession, String) => DataFrame

  /** Largest-remainder (Hamilton) apportionment of 1000 sample slots
    * across (source, lang) cells, proportional to document counts —
    * the EXACT integer answer to "mix the corpus in these proportions"
    * (floating-point quotas drift; floor-only quotas under-allocate;
    * the largest-remainder step hands the leftover slots to the cells
    * floor cheated most). Pure integer arithmetic: base = ⌊c·K/N⌋,
    * remainder-ranked top-up for the Σbase deficit, deterministic
    * (remainder, source, lang) tiebreak. Σalloc = K exactly — spec'd.
    *
    * 100 TB shape: one partial-aggregable count shuffle to |cells|
    * rows; apportionment runs on that tiny frame (single-partition
    * window over ≤ |sources|·|langs| rows — the boundary-window
    * pattern). */
  val qQuotaMix: Q = (s, d) => {
    val k = 1000L
    val cells = Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
    val tot = cells.agg(sum("n_docs").as("n_total"),
      count(lit(1)).as("n_cells"))
    val based = cells.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(n_docs * $k) div n_total"))
      .withColumn("rem", expr(s"(n_docs * $k) % n_total"))
    val w = Window.orderBy(col("rem").desc, col("source"), col("lang"))
    based
      .withColumn("deficit", lit(k) - sum("base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(w))
      .select(col("source"), col("lang"), col("n_docs"), col("base"),
        col("rem"),
        (col("base") + when(col("rn") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("source", "lang")
  }

  /** Greedy token-budget fill: rank documents by length (the
    * deterministic stand-in for a quality score), admit while the
    * CUMULATIVE token count stays within a 100k budget — "give me the
    * best documents that fit the training budget", the curation step
    * after scoring and before packing. Token counts are whitespace-run
    * splits (the repo-wide rule, matching `\s+` on both engines);
    * admission is an integer cumulative-sum window; the report is a
    * per-source census of admitted docs/tokens plus budget slack.
    *
    * 100 TB shape: one token-count scan, one (score, id)-ordered
    * global window — range-partitioned sort, O(1) frame state — then a
    * partial-agg census. (At 100 TB the single ASC sort is the
    * standard total-order exchange; admission could also binary-search
    * a sampled score threshold, same result by determinism.) */
  val qTokenBudget: Q = (s, d) => {
    val budget = 100000L
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val w = Window.orderBy(col("n_tok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val admitted = docs
      .withColumn("cum_tok", sum("n_tok").over(w))
      .filter(col("cum_tok") <= budget)
    admitted.groupBy("source")
      .agg(count(lit(1)).as("n_admitted"), sum("n_tok").as("tok_admitted"),
        max("cum_tok").as("cum_at_last"))
      .orderBy("source")
  }

  /** Wald–Wolfowitz runs test: is the purchase value series random
    * around its LOWER-MEDIAN datum in time order, or does it trend /
    * mean-revert? Signs come from comparing each value to the exact
    * median datum (ties dropped — the textbook rule; a datum threshold
    * makes the sign itself engine-exact, [[graft.operators.Percentiles
    * .groupedMedianLow]]'s argument); the run count is an integer lag
    * comparison; z is the standard normal approximation from exact
    * integers in fixed op order, 6dp.
    *
    * 100 TB shape: one datum-median pass (spillable sort), one
    * time-ordered window pass, one 1-row reduce. */
  val qRunsTest: Q = (s, d) => {
    val pv = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
    val med = graft.operators.Percentiles.groupedMedianLow(
      pv.withColumn("g", lit(1)), "g", "v_c", "med_c")
    val signed = pv.crossJoin(broadcast(med.select("med_c")))
      .filter(col("v_c") =!= col("med_c"))
      .select(col("event_id"), col("ts"),
        when(col("v_c") > col("med_c"), 1L).otherwise(0L).as("above"))
    val w = Window.orderBy("ts", "event_id")
    val runs = signed
      .withColumn("prev", lag("above", 1).over(w))
      .select(
        sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
          .otherwise(0L)).as("n_runs"),
        sum("above").as("n_above"),
        sum(lit(1L) - col("above")).as("n_below"))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val n = n1 + n2
    val mu = lit(2.0) * n1 * n2 / n + 1.0
    val sig2 = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n)) /
      (n * n * (n - 1.0))
    runs.select(col("n_runs"), col("n_above"), col("n_below"),
      round((col("n_runs").cast("double") - mu) / sqrt(sig2), 6).as("z"))
  }

  /** Seasonal-naive forecast backtest: predict each day's revenue as
    * the revenue 7 PERIODS earlier (a row lag over the daily series —
    * equal to 7 calendar days on this dense-date fixture; a sparse
    * calendar would left-join on day − INTERVAL 7 DAY instead), score
    * MAE (exact integer cents) and MAPE (integer ppm) over the days
    * where the lag exists — the
    * baseline every demand forecast must beat, and the backtest
    * harness shape (join forecast to actual, reduce the error) that
    * any real model slots into. The 7-row lag runs on the |days|
    * aggregate, never the fact.
    *
    * 100 TB shape: one partial-agg'd groupBy to |days| rows; the lag
    * window and error reduce are input-scale-free. */
  val qSeasonalNaive: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    val w = Window.orderBy("day")
    val scored = daily
      .withColumn("pred_c", lag("rev_c", 7).over(w))
      .filter(col("pred_c").isNotNull)
      .withColumn("abs_err_c", abs(col("rev_c") - col("pred_c")))
    scored.agg(
      count(lit(1)).as("n_days"),
      sum("abs_err_c").as("sum_abs_err_c"),
      expr("sum(abs_err_c) div count(*)").as("mae_c"),
      expr("sum((abs_err_c * 1000000) div rev_c) div count(*)")
        .as("mape_ppm"))
  }

  val all: Map[String, Q] = Map(
    "q_quota_mix" -> qQuotaMix,
    "q_token_budget" -> qTokenBudget,
    "q_runs_test" -> qRunsTest,
    "q_seasonal_naive" -> qSeasonalNaive,
  )

  val oracles: Map[String, String] = Map(
    "q_quota_mix" ->
      """WITH cells AS (
        | SELECT source, lang, count(*) AS n_docs
        | FROM documents GROUP BY source, lang),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM cells),
        |based AS (
        | SELECT source, lang, n_docs,
        |  CAST((n_docs * 1000) // n_total AS BIGINT) AS base,
        |  CAST((n_docs * 1000) % n_total AS BIGINT) AS rem
        | FROM cells CROSS JOIN tot),
        |ranked AS (
        | SELECT *,
        |  1000 - CAST(sum(base) OVER () AS BIGINT) AS deficit,
        |  row_number() OVER (ORDER BY rem DESC, source, lang) AS rn
        | FROM based)
        |SELECT source, lang, n_docs, base, rem,
        | CAST(base + (CASE WHEN rn <= deficit THEN 1 ELSE 0 END) AS BIGINT)
        |   AS alloc
        |FROM ranked ORDER BY source, lang""".stripMargin,
    "q_token_budget" ->
      """WITH docs AS (
        | SELECT doc_id, source,
        |  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |    AS n_tok
        | FROM documents),
        |cum AS (
        | SELECT doc_id, source, n_tok,
        |  CAST(sum(n_tok) OVER (ORDER BY n_tok DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tok
        | FROM docs)
        |SELECT source, count(*) AS n_admitted,
        | CAST(sum(n_tok) AS BIGINT) AS tok_admitted,
        | CAST(max(cum_tok) AS BIGINT) AS cum_at_last
        |FROM cum WHERE cum_tok <= 100000
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_runs_test" ->
      """WITH pv AS (
        | SELECT event_id, ts, CAST(round(value * 100) AS BIGINT) AS v_c
        | FROM events WHERE event_type = 'purchase'),
        |med AS (
        | SELECT v_c AS med_c FROM (
        |  SELECT v_c, row_number() OVER (ORDER BY v_c) AS rn,
        |   count(*) OVER () AS n
        |  FROM pv)
        | WHERE rn = (n + 1) // 2),
        |signed AS (
        | SELECT event_id, ts,
        |  CASE WHEN v_c > med_c THEN 1 ELSE 0 END AS above
        | FROM pv CROSS JOIN med WHERE v_c <> med_c),
        |runs AS (
        | SELECT
        |  CAST(sum(CASE WHEN prev IS NULL OR prev <> above THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_runs,
        |  CAST(sum(above) AS BIGINT) AS n_above,
        |  CAST(sum(1 - above) AS BIGINT) AS n_below
        | FROM (SELECT above, lag(above) OVER (ORDER BY ts, event_id) AS prev
        |       FROM signed))
        |SELECT n_runs, n_above, n_below,
        | round((CAST(n_runs AS DOUBLE)
        |    - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |       / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)) + 1.0))
        |  / sqrt((2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |     * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
        |        - (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))))
        |    / ((CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
        |       * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
        |       * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE) - 1.0))),
        |  6) AS z
        |FROM runs""".stripMargin,
    "q_seasonal_naive" ->
      """WITH daily AS (
        | SELECT o_orderdate AS day,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_c
        | FROM orders GROUP BY o_orderdate),
        |scored AS (
        | SELECT rev_c, lag(rev_c, 7) OVER (ORDER BY day) AS pred_c
        | FROM daily)
        |SELECT count(*) AS n_days,
        | CAST(sum(abs(rev_c - pred_c)) AS BIGINT) AS sum_abs_err_c,
        | CAST(sum(abs(rev_c - pred_c)) // count(*) AS BIGINT) AS mae_c,
        | CAST(sum((abs(rev_c - pred_c) * 1000000) // rev_c) // count(*)
        |   AS BIGINT) AS mape_ppm
        |FROM scored WHERE pred_c IS NOT NULL""".stripMargin,
  )
}
