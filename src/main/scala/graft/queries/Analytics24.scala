package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r9 batch 6: experimentation (difference-in-differences, one-sample
  * χ² goodness-of-fit — Corpus's q_chi_square covers the two-way
  * independence test), text tooling (keyword-in-context), and the
  * financial reconciliation audit.
  */
object Analytics24 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Difference-in-differences: treatment = user parity, periods split
    * at day 4 — DiD = (T_post − T_pre) − (C_post − C_pre) on mean event
    * value, all four cell means exact integer-cent ratios and the
    * estimate four fixed-order IEEE ops; the causal-readout companion
    * to [[Analytics19.qCuped]].
    *
    * 100 TB shape: one partial-agg'd 4-cell reduce; nothing else. */
  val qDiffInDiff: Q = (s, d) => {
    val split = Tables.events(s, d)
      .agg((min(col("ts")).cast("date") + expr("INTERVAL 4 DAYS"))
        .cast("timestamp").as("split_ts"))
    val cells = Tables.events(s, d)
      .crossJoin(broadcast(split))
      .select((col("user_id") % 2).as("treat"),
        when(col("ts") < col("split_ts"), lit("pre")).otherwise(lit("post"))
          .as("period"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
      .groupBy("treat", "period")
      .agg(count(lit(1)).as("n"), sum("v_c").as("s"))
      .select(col("treat"), col("period"), col("n"), col("s"),
        (col("s").cast("double") / col("n")).as("mean_c"))
    val wide = cells.groupBy(lit(1).as("g"))
      .agg(
        max(when(col("treat") === 1 && col("period") === "post",
          col("mean_c"))).as("t_post"),
        max(when(col("treat") === 1 && col("period") === "pre",
          col("mean_c"))).as("t_pre"),
        max(when(col("treat") === 0 && col("period") === "post",
          col("mean_c"))).as("c_post"),
        max(when(col("treat") === 0 && col("period") === "pre",
          col("mean_c"))).as("c_pre"),
        sum("n").as("n_total"))
    wide.select(col("n_total"),
        round(col("t_pre") / 100.0, 6).as("t_pre"),
        round(col("t_post") / 100.0, 6).as("t_post"),
        round(col("c_pre") / 100.0, 6).as("c_pre"),
        round(col("c_post") / 100.0, 6).as("c_post"),
        round((col("t_post") - col("t_pre") - (col("c_post") - col("c_pre")))
          / 100.0, 6).as("did"))
  }

  /** χ² goodness-of-fit of event types against the uniform mix — the
    * categorical drift alarm: with k cells and expected share 1/k,
    * χ² = k/n · Σ(oᵢ − n/k)² = (k·Σoᵢ² − n²)/n exactly, so the
    * statistic is ONE division of exact integers (no per-cell float),
    * reported in milli units next to the k−1 dof and the 95% decision
    * against the critical value.
    *
    * 100 TB shape: one partial-agg'd census; arithmetic on k rows. */
  val qChiSquare: Q = (s, d) => {
    val cells = Tables.events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("o"))
    cells.agg(count(lit(1)).as("k"), sum("o").as("n"),
        sum(col("o") * col("o")).as("so2"))
      .select(col("k"), col("n"),
        expr("((k * so2 - n * n) * 1000) div n").as("chi2_milli"),
        (col("k") - 1).as("dof"))
      // chi2_0.95 for dof in 1..8, milli units (NIST table)
      .withColumn("crit_milli",
        element_at(array(Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L,
          14067L, 15507L).map(lit): _*), col("dof").cast("int")))
      .withColumn("reject_uniform",
        (col("chi2_milli") > col("crit_milli")).cast("long"))
  }

  /** Keyword-in-context (KWIC): for documents containing the term
    * "data", the ±2-token window around its FIRST occurrence — the
    * concordance view a corpus linguist (or a filter-rule author
    * debugging false positives) works from. Array ops only
    * (array_position + slice), no explode of the corpus.
    *
    * 100 TB shape: per-row expressions over the scan; output is the
    * matching sliver. */
  val qKwic: Q = (s, d) => {
    import graft.text.TextFunctions.tokens
    val tk = tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), tk.as("tk"))
      .withColumn("pos", array_position(col("tk"), "data"))
      .filter(col("pos") > 0)
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("tk"),
          greatest(col("pos") - 2, lit(1)).cast("int"),
          lit(5))).as("context"),
        size(col("tk")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Order reconciliation audit: per order, the header total vs the
    * Σ line extendedprice in cents, bucketed by relative difference —
    * the ledger-integrity census a warehouse load runs. The synthetic
    * tables don't reconcile (by construction), which is exactly what
    * the audit should REPORT, not hide: the bucket census plus the
    * worst absolute discrepancy. Integer cents; the ppm ratio uses the
    * explicit floor-division identity (differences are signed).
    *
    * 100 TB shape: one join + per-order partial agg; the census is a
    * |buckets|-row rollup. */
  val qReconcile: Q = (s, d) => {
    val lines = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("line_total_c"))
    val diff = Tables.orders(s, d)
      .join(lines, col("o_orderkey") === col("okey"))
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("header_c"),
        col("line_total_c"))
      .withColumn("diff_c", col("line_total_c") - col("header_c"))
      .withColumn("adiff_c", abs(col("diff_c")))
      .withColumn("rel_ppm", expr("(adiff_c * 1000000) div header_c"))
      .withColumn("bucket",
        when(col("rel_ppm") === 0, lit("exact"))
          .when(col("rel_ppm") <= 10000, lit("within_1pct"))
          .when(col("rel_ppm") <= 100000, lit("within_10pct"))
          .otherwise(lit("divergent")))
    diff.groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        max("adiff_c").as("max_abs_diff_c"),
        sum("adiff_c").as("total_abs_diff_c"))
      .orderBy("bucket")
  }

  val all: Map[String, Q] = Map(
    "q_diff_in_diff" -> qDiffInDiff,
    "q_chi2_gof" -> qChiSquare,
    "q_kwic" -> qKwic,
    "q_reconcile" -> qReconcile,
  )

  val oracles: Map[String, String] = Map(
    "q_diff_in_diff" ->
      """WITH split AS (
        | SELECT CAST(CAST(min(ts) AS DATE) + INTERVAL 4 DAY AS TIMESTAMP)
        |   AS split_ts FROM events),
        |cells AS (
        | SELECT user_id % 2 AS treat,
        |  CASE WHEN ts < s.split_ts THEN 'pre' ELSE 'post' END AS period,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
        | FROM events CROSS JOIN split s GROUP BY 1, 2),
        |m AS (
        | SELECT treat, period, n, CAST(sv AS DOUBLE) / n AS mean_c FROM cells),
        |wide AS (
        | SELECT
        |  max(CASE WHEN treat = 1 AND period = 'post' THEN mean_c END) AS t_post,
        |  max(CASE WHEN treat = 1 AND period = 'pre' THEN mean_c END) AS t_pre,
        |  max(CASE WHEN treat = 0 AND period = 'post' THEN mean_c END) AS c_post,
        |  max(CASE WHEN treat = 0 AND period = 'pre' THEN mean_c END) AS c_pre,
        |  CAST(sum(n) AS BIGINT) AS n_total
        | FROM m)
        |SELECT n_total,
        | round(t_pre / 100.0, 6) AS t_pre, round(t_post / 100.0, 6) AS t_post,
        | round(c_pre / 100.0, 6) AS c_pre, round(c_post / 100.0, 6) AS c_post,
        | round((t_post - t_pre - (c_post - c_pre)) / 100.0, 6) AS did
        |FROM wide""".stripMargin,
    "q_chi2_gof" ->
      """WITH cells AS (
        | SELECT event_type, count(*) AS o FROM events GROUP BY 1),
        |m AS (
        | SELECT count(*) AS k, CAST(sum(o) AS BIGINT) AS n,
        |  CAST(sum(o * o) AS BIGINT) AS so2
        | FROM cells),
        |crit AS (SELECT [3841, 5991, 7815, 9488, 11070, 12592, 14067, 15507]
        |  AS tbl)
        |SELECT m.k, m.n,
        | CAST(((m.k * m.so2 - m.n * m.n) * 1000) // m.n AS BIGINT)
        |   AS chi2_milli,
        | m.k - 1 AS dof,
        | CAST(tbl[CAST(m.k - 1 AS INT)] AS BIGINT) AS crit_milli,
        | CAST(((m.k * m.so2 - m.n * m.n) * 1000) // m.n
        |   > tbl[CAST(m.k - 1 AS INT)] AS BIGINT) AS reject_uniform
        |FROM m CROSS JOIN crit""".stripMargin,
    "q_kwic" ->
      """WITH tk AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        | FROM documents),
        |hit AS (
        | SELECT doc_id, t, list_position(t, 'data') AS pos FROM tk
        | WHERE list_position(t, 'data') IS NOT NULL
        |   AND list_position(t, 'data') > 0)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        | array_to_string(t[greatest(pos - 2, 1):greatest(pos - 2, 1) + 4], ' ')
        |   AS context,
        | CAST(len(t) AS BIGINT) AS n_tokens
        |FROM hit ORDER BY doc_id""".stripMargin,
    "q_reconcile" ->
      """WITH lines AS (
        | SELECT l_orderkey AS okey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS line_total_c
        | FROM lineitem GROUP BY 1),
        |diff AS (
        | SELECT o.o_orderkey,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_c,
        |  l.line_total_c,
        |  abs(l.line_total_c - CAST(round(o.o_totalprice * 100) AS BIGINT))
        |    AS adiff_c
        | FROM orders o JOIN lines l ON o.o_orderkey = l.okey),
        |b AS (
        | SELECT o_orderkey, adiff_c,
        |  CASE WHEN (adiff_c * 1000000) // header_c = 0 THEN 'exact'
        |       WHEN (adiff_c * 1000000) // header_c <= 10000 THEN 'within_1pct'
        |       WHEN (adiff_c * 1000000) // header_c <= 100000
        |         THEN 'within_10pct'
        |       ELSE 'divergent' END AS bucket
        | FROM diff)
        |SELECT bucket, count(*) AS n_orders,
        | CAST(max(adiff_c) AS BIGINT) AS max_abs_diff_c,
        | CAST(sum(adiff_c) AS BIGINT) AS total_abs_diff_c
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
