package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** r7c analytics batch — the data-quality / evaluation operators that sit
  * beside a curation pipeline: a declarative expectations suite (the
  * Deequ/Great-Expectations constraint-report shape), cross-source
  * quantile normalization, inter-labeler agreement (Cohen's κ),
  * union-of-intervals activity coverage, Kaplan–Meier retention, and a
  * hash-deterministic Poisson-bootstrap confidence interval. All but the
  * bootstrap (xxhash64-seeded) are DuckDB-oracle-paired; float discipline
  * per repo convention (integer milli-proportions and cents everywhere a
  * comparison could drift; rounding only on final reported values).
  */
object Analytics2 {
  type Q = (SparkSession, String) => DataFrame

  /** Declarative data-quality expectations suite — one report row per
    * constraint: completeness, key uniqueness, value range, accepted
    * set, and referential integrity, each with an integer metric and a
    * pass/fail verdict. The Deequ insight kept here: every constraint
    * metric is a PARTIAL-AGGREGABLE aggregate, so the whole suite is ONE
    * scan of the fact + one broadcast anti-join for the RI probe —
    * adding constraints adds columns to the agg, never passes.
    * Metrics in integer milli-proportions (x1000 div) — exact
    * cross-engine.
    *
    * 100 TB shape: single map-side-combined agg over orders (shuffle =
    * one row); the RI check is an anti-join against the driver-sized
    * customer key set (broadcast at real scale; the violation COUNT is
    * what ships, never the rows). */
  val qExpectations: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val metrics = o.agg(
      count(lit(1)).as("n"),
      count(col("o_orderdate")).as("date_nonnull"),
      count_distinct(col("o_orderkey")).as("key_distinct"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("range_viol"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("set_viol"))
    val riViol = o.join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("ri_viol"))
    metrics.crossJoin(riViol)
      .select(expr(
        """stack(5,
          |  'completeness_o_orderdate', (date_nonnull * 1000L) div n,  date_nonnull = n,
          |  'unique_o_orderkey',        (key_distinct * 1000L) div n,  key_distinct = n,
          |  'range_o_totalprice_gt0',   range_viol,                    range_viol = 0L,
          |  'accepted_o_orderstatus',   set_viol,                      set_viol = 0L,
          |  'ri_o_custkey_in_customer', ri_viol,                       ri_viol = 0L)
          |  AS (check_name, metric, ok)""".stripMargin))
      .select(col("check_name"), col("metric").cast("long").as("metric"),
        when(col("ok"), "pass").otherwise("fail").as("status"))
      .orderBy("check_name")
  }

  /** Cross-source quantile normalization of document lengths — the
    * batch-effect correction that forces every source's length
    * distribution onto the pooled reference: a doc at percentile p of
    * its source maps to the corpus-wide mean length at percentile p.
    * Output is the per-(source, percentile) normalization table (what a
    * pipeline would broadcast-join back onto the corpus), with integer
    * div means so both engines agree exactly.
    *
    * 100 TB shape: the only per-row work is one window rank partitioned
    * BY SOURCE (parallel across sources, external-sortable within); the
    * reference distribution is a 100-row aggregate joined back on the
    * percentile key — broadcast-sized by construction. */
  val qQuantileNormalize: Q = (s, d) => {
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val ranked = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("pct", expr("((rn - 1) * 100L) div n"))
    val reference = ranked.groupBy("pct")
      .agg(expr("sum(n_chars) div count(1)").as("norm_chars"))
    ranked.groupBy("source", "pct")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(n_chars) div count(1)").as("raw_chars"))
      .join(reference, Seq("pct"))
      .select("source", "pct", "n_docs", "raw_chars", "norm_chars")
      .orderBy("source", "pct")
  }

  /** Inter-labeler agreement (Cohen's κ) between two independent weak
    * quality labelers — the audit that tells you whether cheap heuristic
    * labels agree beyond chance before training on them. Labeler A:
    * character length ≥ 400; labeler B: whitespace token count ≥ 67
    * (deliberately correlated-but-distinct signals). One aggregate pass
    * builds the 2×2 contingency; κ = (p_o − p_e)/(1 − p_e) is computed
    * from the four integer cells only at report time (round 4).
    *
    * 100 TB shape: both labels are per-row expressions inside one
    * map-side-combined agg — shuffle volume is a single row. */
  val qCohenKappa: Q = (s, d) => {
    val lab = Tables.documents(s, d).select(
      (col("n_chars") >= 400).cast("long").as("a"),
      (size(split(trim(col("text")), "\\s+")) >= 67).cast("long").as("b"))
    lab.agg(
        count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
      .withColumn("po", (col("n11") + col("n00")).cast("double") / col("n"))
      .withColumn("pe",
        ((col("n11") + col("n10")).cast("double") * (col("n11") + col("n01")) +
          (col("n01") + col("n00")).cast("double") * (col("n10") + col("n00"))) /
          (col("n").cast("double") * col("n")))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 4).as("kappa"))
  }

  /** Per-user union-of-intervals activity coverage (gaps and islands):
    * each event opens an interval [ts, ts + value·10 ms]; overlapping
    * intervals merge, and the report is each user's interval count,
    * merged-island count, and total covered microseconds. Duration in
    * integer cents·10k µs (round(value·100)·10 000) so endpoints are
    * exact. The merge is the one-window running-max-of-end pass — no
    * self-join, no explode of the timeline.
    *
    * 100 TB shape: window partitioned by user — embarrassingly parallel
    * across users, external sort within; output is one row per user. */
  val qIntervalUnion: Q = (s, d) => {
    val iv = Tables.events(s, d).select(
      col("user_id"),
      unix_micros(col("ts")).as("start_us"),
      (unix_micros(col("ts")) +
        expr("CAST(round(value * 100) AS BIGINT) * 10000L")).as("end_us"))
    val w = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    val prevMax = max("end_us").over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = iv
      .withColumn("new_island",
        when(prevMax.isNull || col("start_us") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum("new_island").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_iv"), min("start_us").as("s"), max("end_us").as("e"))
    islands.groupBy("user_id")
      .agg(sum("n_iv").as("n_intervals"), count(lit(1)).as("n_islands"),
        sum(col("e") - col("s")).as("covered_us"))
      .orderBy("user_id")
  }

  /** Kaplan–Meier time-to-first-purchase curve with administrative
    * censoring: a user's clock starts at their first event; the event of
    * interest is their first `purchase`; observation is cut at 48 hours,
    * so a user purchasing later (or never) is CENSORED at 48 — their
    * true time is only known to exceed it, and dropping them is the
    * conversion-inflation bug this estimator exists to fix. Output per
    * observed conversion hour: at-risk count, conversion count, censored
    * count, and the product-limit survival Ŝ(t) (computed as
    * exp(Σ ln(1−dᵢ/nᵢ)) over the ordered running window — both engines
    * evaluate the identical sequential FP sum, then round 4). Hours in
    * integer µs-div arithmetic — exact cross-engine.
    *
    * 100 TB shape: one shuffle to per-user (first event, first purchase)
    * extents — both partial-aggregable mins of one pass; the curve then
    * lives on a ≤49-row frame, so the single ordered window is
    * input-scale-free. */
  val qSurvivalKm: Q = (s, d) => {
    val horizon = 48L
    val perUser = Tables.events(s, d).groupBy("user_id").agg(
      min(unix_micros(col("ts"))).as("f_us"),
      min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("fp_us"))
    val lifetimes = perUser.select(
      expr(s"""CASE WHEN fp_us IS NULL OR (fp_us - f_us) div 3600000000L >= $horizon
              | THEN ${horizon}L ELSE (fp_us - f_us) div 3600000000L END""".stripMargin)
        .as("t_hour"),
      expr(s"""CAST(fp_us IS NULL OR (fp_us - f_us) div 3600000000L >= $horizon
              | AS BIGINT)""".stripMargin).as("censored"))
    val perHour = lifetimes.groupBy("t_hour")
      .agg(sum(lit(1L) - col("censored")).as("d_conv"),
        sum(col("censored")).as("c_censored"))
    val w = Window.orderBy("t_hour")
    perHour
      .withColumn("later", (sum(col("d_conv") + col("c_censored"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .crossJoin(lifetimes.agg(count(lit(1)).as("n_total")))
      .withColumn("n_risk", col("n_total") - col("later") + col("d_conv") + col("c_censored"))
      .withColumn("haz_ln", log(lit(1.0) - col("d_conv").cast("double") / col("n_risk")))
      .withColumn("s_hat", round(exp(sum("haz_ln")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))), 4))
      .filter(col("d_conv") > 0)
      .select("t_hour", "n_risk", "d_conv", "c_censored", "s_hat")
      .orderBy("t_hour")
  }

  /** Poisson-bootstrap confidence interval for mean order value by
    * priority — the resampling stderr that needs NO data duplication and
    * no shared RNG state: replicate r weights each row by a Poisson(1)
    * draw inverted from a seeded-md5 uniform — exactly the
    * per-(row, replicate) determinism a 1000-executor rerun needs for
    * reproducibility (no seed coordination, no row numbering), in the
    * r8 DP-release discipline ([[Analytics13.qDpRelease]]) that DuckDB
    * replays bit-for-bit, so the full CI pipeline is oracle-certified
    * (was rows-only under xxhash64).
    *
    * Digest economics (the naive port ran 8×): ONE md5 per (row, octet)
    * yields EIGHT 16-bit uniforms (hex chars 4j+1..4j+4), and the
    * Poisson inversion compares those fixed-width hex slices
    * LEXICOGRAPHICALLY against pre-computed hex thresholds
    * (floor(F(k)·2¹⁶) — ASCII order ≡ numeric order for padded
    * lowercase hex), so there is no conv(), no per-replicate digest,
    * and no 64× row explosion: the 8 replicate-octets aggregate as 16
    * sum columns unpivoted by stack AFTER aggregation. 16-bit uniform
    * resolution biases each pmf threshold by < 2⁻¹⁶ — noise at
    * bootstrap scale. Per-replicate means are exact-integer ratios
    * (one IEEE division); the only cross-engine float surface is the
    * 64-value avg/stddev collapse, rounded at 2 dp.
    *
    * 100 TB shape: one md5 + 16 conditional partial-agg sums per
    * (row, octet) — shuffle volume is |priorities|·8·16 values, not
    * |rows|·R; the per-replicate means then collapse to a 5-row
    * report. */
  val qBootstrapCi: Q = (s, d) => {
    // cumulative Poisson(1) pmf at 16-bit resolution, as 4-char hex
    val th = Seq("5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9")
    // w_j is PROJECTED before the aggregate (each hex slice cut and
    // compared once per row) — inlining the cascade into the 16 agg
    // expressions re-evaluated substring ~100× per row (measured 2.5 s
    // vs 1 s at sf0.1)
    def w(j: Int) = {
      val sub = col(s"s_$j")
      th.zipWithIndex.foldLeft(when(sub < th.head, 0L)) {
        case (acc, (t, i)) if i > 0 => acc.when(sub < t, i.toLong)
        case (acc, _) => acc
      }.otherwise(6L).as(s"w_$j")
    }
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("priority"), col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_c"))
      .withColumn("g", explode(sequence(lit(0), lit(7))))
      .withColumn("dig", md5(concat(lit("boot-2:"), col("o_orderkey"),
        lit(":"), col("g"))))
      .select(Seq(col("priority"), col("g"), col("price_c")) ++
        (0 until 8).map(j => substring(col("dig"), 4 * j + 1, 4).as(s"s_$j")): _*)
      .select(Seq(col("priority"), col("g"), col("price_c")) ++
        (0 until 8).map(w): _*)
    val aggs = (0 until 8).flatMap { j =>
      Seq(sum(col(s"w_$j") * col("price_c")).as(s"num_$j"),
        sum(col(s"w_$j")).as(s"den_$j"))
    }
    val perOctet = o.groupBy("priority", "g").agg(aggs.head, aggs.drop(1): _*)
    val stacked = (0 until 8).map(j => s"$j, num_$j, den_$j").mkString(", ")
    val perRep = perOctet
      .select(col("priority"), col("g"),
        expr(s"stack(8, $stacked) AS (j, num, den)"))
      .select(col("priority"), (col("g") * 8 + col("j")).as("r"),
        (col("num").cast("double") / col("den") / 100.0).as("mean_r"))
    perRep.groupBy("priority")
      .agg(round(avg("mean_r"), 2).as("boot_mean"),
        round(stddev_samp("mean_r"), 2).as("boot_se"),
        round(avg("mean_r") - lit(1.96) * stddev_samp("mean_r"), 2).as("ci_lo"),
        round(avg("mean_r") + lit(1.96) * stddev_samp("mean_r"), 2).as("ci_hi"))
      .orderBy("priority")
  }

  val all: Map[String, Q] = Map(
    "q_expectations" -> qExpectations,
    "q_quantile_normalize" -> qQuantileNormalize,
    "q_cohen_kappa" -> qCohenKappa,
    "q_interval_union" -> qIntervalUnion,
    "q_survival_km" -> qSurvivalKm,
    "q_bootstrap_ci" -> qBootstrapCi,
  )

  val oracles: Map[String, String] = Map(
    "q_expectations" ->
      """WITH m AS (
        | SELECT count(*) AS n, count(o_orderdate) AS date_nonnull,
        |  count(DISTINCT o_orderkey) AS key_distinct,
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS range_viol,
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS set_viol
        | FROM orders),
        |ri AS (
        | SELECT count(*) AS ri_viol FROM orders
        | WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |rows_ AS (
        | SELECT 'completeness_o_orderdate' AS check_name, (date_nonnull * 1000) // n AS metric,
        |        date_nonnull = n AS ok FROM m
        | UNION ALL SELECT 'unique_o_orderkey', (key_distinct * 1000) // n, key_distinct = n FROM m
        | UNION ALL SELECT 'range_o_totalprice_gt0', range_viol, range_viol = 0 FROM m
        | UNION ALL SELECT 'accepted_o_orderstatus', set_viol, set_viol = 0 FROM m
        | UNION ALL SELECT 'ri_o_custkey_in_customer', ri_viol, ri_viol = 0 FROM ri)
        |SELECT check_name, CAST(metric AS BIGINT) AS metric,
        | CASE WHEN ok THEN 'pass' ELSE 'fail' END AS status
        |FROM rows_ ORDER BY check_name""".stripMargin,
    "q_quantile_normalize" ->
      """WITH ranked AS (
        | SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n
        | FROM documents),
        |p AS (
        | SELECT source, n_chars, ((rn - 1) * 100) // n AS pct FROM ranked),
        |ref AS (
        | SELECT pct, CAST(sum(n_chars) AS BIGINT) // count(*) AS norm_chars
        | FROM p GROUP BY pct)
        |SELECT source, CAST(p.pct AS BIGINT) AS pct, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) // count(*) AS raw_chars,
        | CAST(norm_chars AS BIGINT) AS norm_chars
        |FROM p JOIN ref ON p.pct = ref.pct
        |GROUP BY source, p.pct, norm_chars
        |ORDER BY source, pct""".stripMargin,
    "q_cohen_kappa" ->
      """WITH lab AS (
        | SELECT CAST(n_chars >= 400 AS BIGINT) AS a,
        |  CAST(len(string_split_regex(trim(text), '\s+')) >= 67 AS BIGINT) AS b
        | FROM documents),
        |c AS (
        | SELECT count(*) AS n,
        |  CAST(sum(a * b) AS BIGINT) AS n11, CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |  CAST(sum((1 - a) * b) AS BIGINT) AS n01,
        |  CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        | FROM lab)
        |SELECT n, n11, n10, n01, n00,
        | round(((CAST(n11 + n00 AS DOUBLE) / n) -
        |   ((CAST(n11 + n10 AS DOUBLE) * (n11 + n01) +
        |     CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n))) /
        |  (1.0 - ((CAST(n11 + n10 AS DOUBLE) * (n11 + n01) +
        |     CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n))), 4)
        |  AS kappa
        |FROM c""".stripMargin,
    "q_interval_union" ->
      """WITH iv AS (
        | SELECT user_id, epoch_us(ts) AS start_us,
        |  epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 10000 AS end_us
        | FROM events),
        |flags AS (
        | SELECT user_id, start_us, end_us,
        |  CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |    OR start_us > max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |   THEN 1 ELSE 0 END AS new_island
        | FROM iv),
        |isl AS (
        | SELECT user_id, start_us, end_us,
        |  sum(new_island) OVER (PARTITION BY user_id ORDER BY start_us, end_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM flags),
        |merged AS (
        | SELECT user_id, island, count(*) AS n_iv, min(start_us) AS s, max(end_us) AS e
        | FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        | count(*) AS n_islands, CAST(sum(e - s) AS BIGINT) AS covered_us
        |FROM merged GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_survival_km" ->
      """WITH per_user AS (
        | SELECT user_id, min(epoch_us(ts)) AS f_us,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp_us
        | FROM events GROUP BY user_id),
        |lt AS (
        | SELECT
        |  CASE WHEN fp_us IS NULL OR (fp_us - f_us) // 3600000000 >= 48
        |   THEN 48 ELSE (fp_us - f_us) // 3600000000 END AS t_hour,
        |  CAST(fp_us IS NULL OR (fp_us - f_us) // 3600000000 >= 48 AS BIGINT) AS censored
        | FROM per_user),
        |per_hour AS (
        | SELECT t_hour, CAST(sum(1 - censored) AS BIGINT) AS d_conv,
        |  CAST(sum(censored) AS BIGINT) AS c_censored
        | FROM lt GROUP BY t_hour),
        |curve AS (
        | SELECT t_hour, d_conv, c_censored,
        |  (SELECT count(*) FROM lt) -
        |   sum(d_conv + c_censored) OVER (ORDER BY t_hour
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) +
        |   d_conv + c_censored AS n_risk
        | FROM per_hour),
        |km AS (
        | SELECT t_hour, n_risk, d_conv, c_censored,
        |  round(exp(sum(ln(1.0 - CAST(d_conv AS DOUBLE) / n_risk)) OVER (ORDER BY t_hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) AS s_hat
        | FROM curve)
        |SELECT CAST(t_hour AS BIGINT) AS t_hour, CAST(n_risk AS BIGINT) AS n_risk,
        | d_conv, c_censored, s_hat
        |FROM km WHERE d_conv > 0 ORDER BY t_hour""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH octets AS (SELECT unnest(range(0, 8)) AS g),
        |js AS (SELECT unnest(range(0, 8)) AS j),
        |ex AS (
        | SELECT o.o_orderpriority AS priority,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_c, octets.g,
        |  md5('boot-2:' || o.o_orderkey || ':' || octets.g) AS dig
        | FROM orders o CROSS JOIN octets),
        |wt AS (
        | SELECT priority, g, js.j, price_c,
        |  CASE WHEN substr(dig, 4 * js.j + 1, 4) < '5e2d' THEN 0
        |       WHEN substr(dig, 4 * js.j + 1, 4) < 'bc5a' THEN 1
        |       WHEN substr(dig, 4 * js.j + 1, 4) < 'eb71' THEN 2
        |       WHEN substr(dig, 4 * js.j + 1, 4) < 'fb23' THEN 3
        |       WHEN substr(dig, 4 * js.j + 1, 4) < 'ff10' THEN 4
        |       WHEN substr(dig, 4 * js.j + 1, 4) < 'ffd9' THEN 5
        |       ELSE 6 END AS w
        | FROM ex CROSS JOIN js),
        |per_rep AS (
        | SELECT priority, g * 8 + j AS r,
        |  CAST(sum(w * price_c) AS DOUBLE) / CAST(sum(w) AS BIGINT) / 100.0
        |    AS mean_r
        | FROM wt GROUP BY priority, g, j)
        |SELECT priority, round(avg(mean_r), 2) AS boot_mean,
        | round(stddev_samp(mean_r), 2) AS boot_se,
        | round(avg(mean_r) - 1.96 * stddev_samp(mean_r), 2) AS ci_lo,
        | round(avg(mean_r) + 1.96 * stddev_samp(mean_r), 2) AS ci_hi
        |FROM per_rep GROUP BY priority ORDER BY priority""".stripMargin,
  )
}
