package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 16: viz-downsampling, SFT pair assembly, epidemiological
  * ratios, and a higher-order-function LIS — plus the sliding-window
  * streaming entry that lands in [[StreamingQ]]. Exact integers
  * everywhere; the one data-dependent ln (risk ratio) follows the
  * 1-row micro-round discipline, and the CI is reported in LOG space
  * so no exp() ever runs.
  */
object Analytics34 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** M4 downsampling (Jugel et al., VLDB 2014): per pixel-bucket emit
    * the first/last/min/max points of the daily revenue series — the
    * lossless-for-line-rendering reduction every dashboard needs
    * before plotting 10⁵ points into 10² pixels. Fully declarative
    * (one groupBy, four argmin/argmax picks via min_by/max_by with
    * deterministic day tiebreaks), unlike LTTB's sequential fold.
    * 40 buckets by day-index range, exact integers.
    *
    * 100 TB shape: fact → |days| frame → one 40-key partial agg. */
  val qM4Downsample: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .withColumn("i", expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT)"))
    val bounds = daily.agg(min("i").as("i0"), max("i").as("i1"))
    daily.join(broadcast(bounds))
      .withColumn("b", expr("least(((i - i0) * 40) div (i1 - i0 + 1), 39)"))
      // composite integer tiebreak keys (day index i < 10⁵): engines
      // disagree on struct/list argmin keys, a BIGINT key they share
      .withColumn("k_min", expr("CAST(rev_c AS DECIMAL(38,0)) * 100000 + i"))
      .withColumn("k_max", expr("CAST(rev_c AS DECIMAL(38,0)) * 100000 + (99999 - i)"))
      .groupBy("b")
      .agg(count(lit(1)).as("n_days"),
        expr("min_by(named_struct('i', i, 'v', rev_c), i)").as("first_p"),
        expr("max_by(named_struct('i', i, 'v', rev_c), i)").as("last_p"),
        expr("min_by(named_struct('i', i, 'v', rev_c), k_min)").as("min_p"),
        expr("max_by(named_struct('i', i, 'v', rev_c), k_max)").as("max_p"))
      .select(col("b"), col("n_days"),
        col("first_p.v").as("first_c"), col("last_p.v").as("last_c"),
        col("min_p.v").as("min_c"), col("max_p.v").as("max_c"),
        col("min_p.i").as("min_i"), col("max_p.i").as("max_i"))
      .orderBy("b")
  }

  /** SFT pair assembly: split each English document into a 32-token
    * prompt and the remaining completion, keep documents with ≥48
    * tokens, and emit length accounting plus md5 content fingerprints
    * (engine-portable; the downstream JSONL writer consumes exactly
    * this frame). The whole query is array slicing + concat_ws + md5 —
    * codegen'd, no UDF.
    *
    * 100 TB shape: per-row narrow transforms, no shuffle until the
    * (optional) consumer; filters push to the scan. */
  val qSftPairs: Q = (s, d) => {
    Tables.documents(s, d)
      .filter(col("lang") === "en")
      .withColumn("toks", filter(tokens(col("text")), w => length(w) > 0))
      .filter(size(col("toks")) >= 48)
      .select(col("doc_id"),
        expr("size(toks)").cast("long").as("n_tokens"),
        expr("md5(concat_ws(' ', slice(toks, 1, 32)))").as("prompt_md5"),
        expr("md5(concat_ws(' ', slice(toks, 33, size(toks) - 32)))").as("completion_md5"),
        expr("CAST(size(toks) - 32 AS BIGINT)").as("n_completion"))
      .orderBy("doc_id")
  }

  /** Risk ratio of purchasing between the odd- and even-user cohorts
    * with the Katz log CI — reported entirely in LOG space (micro-
    * nats), so the only transcendentals are ONE rounded ln on the
    * 1-row cell frame and IEEE-exact sqrt: lo/hi = lnRR ∓ z·se, z the
    * literal 1.959963984540054. Cells are exact integers; rates in
    * exact ppm.
    *
    * 100 TB shape: one 2×2 census pass; everything after is 1-row. */
  val qRiskRatio: Q = (s, d) => {
    val cells = Tables.events(s, d)
      .groupBy((col("user_id") % 2 === 1).as("exposed"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
    val a = cells.filter(col("exposed")).select(col("n").as("n1"), col("k").as("k1"))
    val b = cells.filter(!col("exposed")).select(col("n").as("n0"), col("k").as("k0"))
    a.join(broadcast(b))
      .withColumn("lnrr_micro", expr(
        """CAST(round(ln((CAST(k1 AS DOUBLE) / n1) / (CAST(k0 AS DOUBLE) / n0))
           * 1000000) AS BIGINT)"""))
      .withColumn("zse_micro", expr(
        """CAST(round(1.959963984540054E0
           * sqrt(1.0 / k1 - 1.0 / n1 + 1.0 / k0 - 1.0 / n0) * 1000000) AS BIGINT)"""))
      .select(col("n1"), col("k1"), col("n0"), col("k0"),
        expr("(k1 * 1000000) div n1").as("p1_ppm"),
        expr("(k0 * 1000000) div n0").as("p0_ppm"),
        col("lnrr_micro"),
        (col("lnrr_micro") - col("zse_micro")).as("ci_lo_micro"),
        (col("lnrr_micro") + col("zse_micro")).as("ci_hi_micro"))
  }

  /** Longest strictly-increasing subsequence of the daily revenue
    * series by patience sorting, folded with the `aggregate` HOF over
    * the day-sorted array — the pile-tops array is the state, each
    * step replaces the first top ≥ y (lower-bound position via a
    * codegen'd filter count). O(|days|²) array work on a ≤2.4k frame,
    * zero UDFs. The oracle replays the identical fold as a recursive
    * CTE over a DuckDB list. The longest DECREASING subsequence rides
    * along (patience on negated values) — together they bound the
    * series' sortedness (Erdős–Szekeres).
    *
    * 100 TB shape: the fact collapses to |days| first; an LIS is
    * inherently sequential — this is the documented bounded-frame
    * exception, same class as q_holt_linear. */
  val qLis: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    daily.agg(
        count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, rev_c))), x -> x.rev_c)")
          .as("ys"))
      .select(col("n_days"),
        expr("""size(aggregate(ys, CAST(array() AS ARRAY<BIGINT>),
                (acc, y) -> CASE
                  WHEN size(filter(acc, t -> t < y)) = size(acc)
                    THEN concat(acc, array(y))
                  ELSE concat(
                    slice(acc, 1, size(filter(acc, t -> t < y))),
                    array(y),
                    slice(acc, size(filter(acc, t -> t < y)) + 2,
                      size(acc) - size(filter(acc, t -> t < y)) - 1)) END))""")
          .cast("long").as("lis_len"),
        expr("""size(aggregate(ys, CAST(array() AS ARRAY<BIGINT>),
                (acc, y) -> CASE
                  WHEN size(filter(acc, t -> t > y)) = size(acc)
                    THEN concat(acc, array(y))
                  ELSE concat(
                    slice(acc, 1, size(filter(acc, t -> t > y))),
                    array(y),
                    slice(acc, size(filter(acc, t -> t > y)) + 2,
                      size(acc) - size(filter(acc, t -> t > y)) - 1)) END))""")
          .cast("long").as("lds_len"))
  }

  val all: Map[String, Q] = Map(
    "q_m4_downsample" -> qM4Downsample,
    "q_sft_pairs" -> qSftPairs,
    "q_risk_ratio" -> qRiskRatio,
    "q_lis" -> qLis,
  )

  val oracles: Map[String, String] = Map(
    "q_m4_downsample" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c,
        |   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS i
        | FROM orders GROUP BY 1, 3),
        |bounds AS (SELECT min(i) AS i0, max(i) AS i1 FROM daily),
        |bucketed AS (
        | SELECT *, least(((i - i0) * 40) // (i1 - i0 + 1), 39) AS b,
        |   CAST(rev_c AS HUGEINT) * 100000 + i AS k_min,
        |   CAST(rev_c AS HUGEINT) * 100000 + (99999 - i) AS k_max
        | FROM daily, bounds)
        |SELECT b, count(*) AS n_days,
        | CAST(min_by(rev_c, i) AS BIGINT) AS first_c,
        | CAST(max_by(rev_c, i) AS BIGINT) AS last_c,
        | CAST(min_by(rev_c, k_min) AS BIGINT) AS min_c,
        | CAST(max_by(rev_c, k_max) AS BIGINT) AS max_c,
        | CAST(min_by(i, k_min) AS BIGINT) AS min_i,
        | CAST(max_by(i, k_max) AS BIGINT) AS max_i
        |FROM bucketed GROUP BY b ORDER BY b""".stripMargin,
    "q_sft_pairs" ->
      """WITH t AS (
        | SELECT doc_id,
        |   list_filter(string_split_regex(trim(text), '\s+'),
        |     w -> length(w) > 0) AS toks
        | FROM documents WHERE lang = 'en')
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        | md5(list_aggregate(toks[1:32], 'string_agg', ' ')) AS prompt_md5,
        | md5(list_aggregate(toks[33:], 'string_agg', ' ')) AS completion_md5,
        | CAST(len(toks) - 32 AS BIGINT) AS n_completion
        |FROM t WHERE len(toks) >= 48
        |ORDER BY doc_id""".stripMargin,
    "q_risk_ratio" ->
      """WITH cells AS (
        | SELECT user_id % 2 = 1 AS exposed, count(*) AS n,
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |     AS BIGINT) AS k
        | FROM events GROUP BY 1),
        |a AS (SELECT n AS n1, k AS k1 FROM cells WHERE exposed),
        |b AS (SELECT n AS n0, k AS k0 FROM cells WHERE NOT exposed),
        |f AS (
        | SELECT n1, k1, n0, k0,
        |  CAST(round(ln((CAST(k1 AS DOUBLE) / n1) / (CAST(k0 AS DOUBLE) / n0))
        |    * 1000000) AS BIGINT) AS lnrr_micro,
        |  CAST(round(1.959963984540054E0
        |    * sqrt(1.0 / k1 - 1.0 / n1 + 1.0 / k0 - 1.0 / n0) * 1000000) AS BIGINT)
        |    AS zse_micro
        | FROM a, b)
        |SELECT n1, k1, n0, k0,
        | CAST((k1 * 1000000) // n1 AS BIGINT) AS p1_ppm,
        | CAST((k0 * 1000000) // n0 AS BIGINT) AS p0_ppm,
        | lnrr_micro,
        | lnrr_micro - zse_micro AS ci_lo_micro,
        | lnrr_micro + zse_micro AS ci_hi_micro
        |FROM f""".stripMargin,
    "q_lis" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |arr AS (
        | SELECT count(*) AS n_days, list(rev_c ORDER BY day) AS ys FROM daily),
        |rec AS (
        | WITH RECURSIVE p(t, inc, dec) AS (
        |  SELECT 0, CAST([] AS BIGINT[]), CAST([] AS BIGINT[]) FROM arr
        |  UNION ALL
        |  SELECT t + 1,
        |   CASE WHEN len(list_filter(inc, x -> x < y)) = len(inc)
        |     THEN list_append(inc, y)
        |     ELSE list_concat(list_concat(
        |       inc[1:len(list_filter(inc, x -> x < y))], [y]),
        |       inc[len(list_filter(inc, x -> x < y)) + 2:]) END,
        |   CASE WHEN len(list_filter(dec, x -> x > y)) = len(dec)
        |     THEN list_append(dec, y)
        |     ELSE list_concat(list_concat(
        |       dec[1:len(list_filter(dec, x -> x > y))], [y]),
        |       dec[len(list_filter(dec, x -> x > y)) + 2:]) END
        |  FROM (SELECT t, inc, dec, arr.ys[t + 1] AS y
        |        FROM p, arr WHERE t < arr.n_days) s)
        | SELECT * FROM p)
        |SELECT a.n_days,
        | CAST(len(r.inc) AS BIGINT) AS lis_len,
        | CAST(len(r.dec) AS BIGINT) AS lds_len
        |FROM arr a JOIN rec r ON r.t = a.n_days""".stripMargin,
  )
}
