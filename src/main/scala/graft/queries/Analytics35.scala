package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 17: Pettitt changepoint, Katz centrality, unicode-class
  * profiling, ROC curve points, and an md5-seeded randomization test —
  * one entry each for the time-series, graph, text, ML-eval, and
  * resampling layers. Rank arithmetic rides the census patterns;
  * Katz's attenuation powers are LITERAL ppm integers; the
  * randomization test replays the seeded-md5 draw discipline
  * (q_dp_release / q_bootstrap_ci) so the oracle certifies every
  * permutation.
  */
object Analytics35 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Pettitt changepoint test on daily revenue: U_t = ΣᵢₜR_i − t(N+1)
    * over average ranks (2×-integer census build), K* = max|U_t| with
    * the earliest-day argmax. The significance exponent argument
    * 6K²·10⁶ div (N³+N²) is emitted as an exact integer (the reader
    * thresholds it against −ln α — no exp() in the engine).
    *
    * 100 TB shape: fact → |days| frame; the rank census and cumsum
    * windows run over ≤2.4k rows. ΣR2 = 2ΣR makes U_t = ΣR2 − t(N+1)
    * directly integer even under ties. */
  val qPettitt: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    val wv = Window.orderBy("rev_c").rowsBetween(Window.unboundedPreceding, -1)
    val census = daily.groupBy("rev_c").agg(count(lit(1)).as("cnt"))
      .withColumn("below", coalesce(sum("cnt").over(wv), lit(0L)))
      .withColumn("r2", col("below") * 2 + col("cnt") + 1)
    val ranked = daily.join(census.select("rev_c", "r2"), "rev_c")
    val wt = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val u = ranked
      .withColumn("t", count(lit(1)).over(wt))
      .withColumn("sr2", sum("r2").over(wt))
      .join(broadcast(daily.agg(count(lit(1)).as("n"))))
      .withColumn("u2", expr("sr2 - t * (n + 1)"))
      .filter(col("t") < col("n"))
    u.orderBy(abs(col("u2")).desc, col("day")).limit(1)
      .select(col("n"),
        col("day").cast("string").as("change_day"),
        col("u2").as("u2_at_change"),
        expr("abs(u2)").as("k_stat"),
        expr("""CAST((CAST(abs(u2) AS DECIMAL(38,0)) * abs(u2) * 6000000)
                div (CAST(n AS DECIMAL(38,0)) * n * n + CAST(n AS DECIMAL(38,0)) * n)
                AS BIGINT)""").as("exp_arg_micro"))
  }

  /** Katz centrality truncated at 3 hops on the customer↔supplier
    * graph (β=0.05 as LITERAL ppm attenuations 50000/2500/125): walk
    * counts come from degree convolutions — w₂(v)=Σ_nbr deg, w₃(v)=
    * Σ_nbr w₂ — never a materialized walk, so the whole thing is two
    * equi-joins over the edge list. Top 20 nodes, exact integer
    * micro-scores.
    *
    * 100 TB shape: |E| joins with 8-byte keys; the node id encodes
    * customer/supplier disjointly (2k / 2k+1, the Graph.scala
    * convention). */
  val qKatzCentrality: Q = (s, d) => {
    // checkpoint: the directed edge set feeds THREE walk legs (deg, w2,
    // w3) — each otherwise replays the lineitem⋈orders + distinct
    // pipeline (r16; measured three back-to-back 0.8 s build jobs at
    // sf0.1). |E|-sized → serialized residency like the rest of the
    // graph family.
    val eo = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val edges = eo.union(eo.select(col("b").as("a"), col("a").as("b")))
    val deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
    val w2 = edges.join(deg.withColumnRenamed("a", "b"), "b")
      .groupBy("a").agg(sum("deg").as("w2"))
    val w3 = edges.join(w2.withColumnRenamed("a", "b"), "b")
      .groupBy("a").agg(sum("w2").as("w3"))
    deg.join(w2, "a").join(w3, "a")
      .select(col("a").as("node"), col("deg"), col("w2"), col("w3"),
        expr("deg * 50000 + w2 * 2500 + w3 * 125").as("katz_micro"))
      .orderBy(col("katz_micro").desc, col("node"))
      .limit(20)
  }

  /** Character-class profile per language: lowercase / uppercase /
    * digit / space / other shares in exact ppm, counted as length
    * differences after class-regex deletion (codegen'd, identical
    * ASCII-class semantics in both engines). The structural signal
    * under q_lang_id and q_code_detect.
    *
    * 100 TB shape: per-row narrow string work in the scan projection,
    * one 5-row agg. */
  val qUnicodeClasses: Q = (s, d) => {
    val t = Tables.documents(s, d).select(col("lang"), col("text").as("t"))
      .select(col("lang"),
        length(col("t")).cast("long").as("n"),
        (length(col("t")) - length(regexp_replace(col("t"), "[a-z]", ""))).cast("long").as("lo"),
        (length(col("t")) - length(regexp_replace(col("t"), "[A-Z]", ""))).cast("long").as("up"),
        (length(col("t")) - length(regexp_replace(col("t"), "[0-9]", ""))).cast("long").as("di"),
        (length(col("t")) - length(regexp_replace(col("t"), " ", ""))).cast("long").as("sp"))
    t.groupBy("lang")
      .agg(sum("n").as("n_chars"), sum("lo").as("lower_n"), sum("up").as("upper_n"),
        sum("di").as("digit_n"), sum("sp").as("space_n"))
      .select(col("lang"), col("n_chars"),
        expr("(lower_n * 1000000) div n_chars").as("lower_ppm"),
        expr("(upper_n * 1000000) div n_chars").as("upper_ppm"),
        expr("(digit_n * 1000000) div n_chars").as("digit_ppm"),
        expr("(space_n * 1000000) div n_chars").as("space_ppm"),
        expr("((n_chars - lower_n - upper_n - digit_n - space_n) * 1000000) div n_chars")
          .as("other_ppm"))
      .orderBy("lang")
  }

  /** ROC curve points for "account balance predicts a heavy orderer
    * (≥8 orders)": 19 thresholds at the 5%-rank grid of the score
    * domain (exact data values by rank selection), TPR/FPR in exact
    * ppm from one cumulative census — the curve behind
    * q_classifier_eval's scalar AUC.
    *
    * 100 TB shape: score census + one cumsum window over it; the
    * 19-row threshold frame broadcasts. */
  val qRocCurve: Q = (s, d) => {
    val cnts = Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_o"))
    val scored = Tables.customer(s, d)
      .join(cnts, col("c_custkey") === col("o_custkey"), "left")
      .select(expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bc"),
        (coalesce(col("n_o"), lit(0L)) >= 8).cast("long").as("y"))
    val census = scored.groupBy("bc")
      .agg(sum("y").as("pos"), sum(lit(1) - col("y")).as("neg"))
    val wGe = Window.orderBy(col("bc").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = census
      .withColumn("tp", sum("pos").over(wGe))
      .withColumn("fp", sum("neg").over(wGe))
    val tot = scored.agg(sum("y").as("p_tot"),
      sum(lit(1) - col("y")).as("n_tot"), count(lit(1)).as("n"))
    val wRank = Window.orderBy(col("bc").desc)
    val ranked = scored.select("bc").distinct()
      .withColumn("rk", row_number().over(wRank))
    val nd = ranked.agg(max("rk").as("n_vals"))
    val thresholds = ranked.join(broadcast(nd))
      .filter(expr("rk % greatest(n_vals div 20, 1) = 0 AND rk div greatest(n_vals div 20, 1) <= 19"))
      .select(col("bc"), expr("rk div greatest(n_vals div 20, 1)").as("step"))
    thresholds.join(cum, "bc").join(broadcast(tot))
      .select(col("step"), col("bc").as("threshold_c"),
        expr("(tp * 1000000) div p_tot").as("tpr_ppm"),
        expr("(fp * 1000000) div n_tot").as("fpr_ppm"))
      .orderBy("step")
  }

  /** Randomization test for the BUILDING−MACHINERY balance gap: 64
    * Bernoulli(½) relabelings drawn from md5(b‖custkey) (the seeded
    * portable-draw discipline — every permutation is replayable in
    * DuckDB), two-sided p as the share of relabeled |mean gaps| ≥ the
    * observed |gap|. Gap comparisons run on doubles built identically
    * from exact integer sums.
    *
    * 100 TB shape: the 64× explode happens AFTER projecting to
    * (custkey, cents) — 64·|customers| narrow rows, one partial agg;
    * at real scale you'd sample customers first (documented). */
  val qPermTest: Q = (s, d) => {
    val base = Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey").as("ck"),
        (col("c_mktsegment") === "BUILDING").cast("int").as("g"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bc"))
    val obs = base.groupBy("g")
      .agg(sum("bc").as("s"), count(lit(1)).as("n"))
      .agg(
        sum(when(col("g") === 1, col("s"))).as("s1"),
        sum(when(col("g") === 1, col("n"))).as("n1"),
        sum(when(col("g") === 0, col("s"))).as("s0"),
        sum(when(col("g") === 0, col("n"))).as("n0"))
      .select(expr("abs(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)").as("obs_gap"))
    val perms = base.crossJoin(broadcast(
        s.range(1, 65).toDF("b")))
      .withColumn("gp", expr("CAST(conv(substring(md5(concat(CAST(b AS STRING), '_', CAST(ck AS STRING))), 1, 1), 16, 10) AS INT) % 2"))
      .groupBy("b")
      .agg(
        sum(when(col("gp") === 1, col("bc"))).as("s1"),
        sum(col("gp").cast("long")).as("n1"),
        sum(when(col("gp") === 0, col("bc"))).as("s0"),
        sum((lit(1) - col("gp")).cast("long")).as("n0"))
      .withColumn("gap", expr("abs(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)"))
    perms.join(broadcast(obs))
      .agg(count(lit(1)).as("n_perms"),
        sum((col("gap") >= col("obs_gap")).cast("long")).as("n_ge"),
        max(expr("CAST(round(obs_gap, 4) AS DOUBLE)")).as("obs_gap_c"))
      .withColumn("p_ppm", expr("(n_ge * 1000000) div n_perms"))
  }

  val all: Map[String, Q] = Map(
    "q_pettitt" -> qPettitt,
    "q_katz_centrality" -> qKatzCentrality,
    "q_unicode_classes" -> qUnicodeClasses,
    "q_roc_curve" -> qRocCurve,
    "q_perm_test" -> qPermTest,
  )

  val oracles: Map[String, String] = Map(
    "q_pettitt" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |census AS (
        | SELECT rev_c,
        |   coalesce(sum(cnt) OVER (ORDER BY rev_c
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
        |     + cnt + 1 AS r2
        | FROM (SELECT rev_c, count(*) AS cnt FROM daily GROUP BY rev_c) c),
        |u AS (
        | SELECT day,
        |   sum(r2) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |     AND CURRENT ROW)
        |   - (row_number() OVER (ORDER BY day)) * ((SELECT count(*) FROM daily) + 1)
        |     AS u2,
        |   row_number() OVER (ORDER BY day) AS t
        | FROM daily JOIN census USING (rev_c)),
        |n_ AS (SELECT count(*) AS n FROM daily),
        |best AS (
        | SELECT * FROM u, n_ WHERE t < n
        | ORDER BY abs(u2) DESC, day LIMIT 1)
        |SELECT CAST(n AS BIGINT) AS n, CAST(day AS VARCHAR) AS change_day,
        | CAST(u2 AS BIGINT) AS u2_at_change, CAST(abs(u2) AS BIGINT) AS k_stat,
        | CAST((CAST(abs(u2) AS HUGEINT) * abs(u2) * 6000000)
        |   // (CAST(n AS HUGEINT) * n * n + CAST(n AS HUGEINT) * n)
        |   AS BIGINT) AS exp_arg_micro
        |FROM best""".stripMargin,
    "q_katz_centrality" ->
      """WITH eo AS (
        | SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT a, b FROM eo UNION ALL SELECT b, a FROM eo),
        |deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
        |w2 AS (
        | SELECT e.a, CAST(sum(d.deg) AS BIGINT) AS w2
        | FROM edges e JOIN deg d ON e.b = d.a GROUP BY e.a),
        |w3 AS (
        | SELECT e.a, CAST(sum(w.w2) AS BIGINT) AS w3
        | FROM edges e JOIN w2 w ON e.b = w.a GROUP BY e.a)
        |SELECT deg.a AS node, CAST(deg.deg AS BIGINT) AS deg, w2.w2, w3.w3,
        | CAST(deg.deg * 50000 + w2.w2 * 2500 + w3.w3 * 125 AS BIGINT) AS katz_micro
        |FROM deg JOIN w2 ON deg.a = w2.a JOIN w3 ON deg.a = w3.a
        |ORDER BY katz_micro DESC, node LIMIT 20""".stripMargin,
    "q_unicode_classes" ->
      """WITH t AS (
        | SELECT lang, length(text) AS n,
        |  length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS lo,
        |  length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS up,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS di,
        |  length(text) - length(regexp_replace(text, ' ', '', 'g')) AS sp
        | FROM documents),
        |g AS (
        | SELECT lang, CAST(sum(n) AS BIGINT) AS n_chars,
        |   CAST(sum(lo) AS BIGINT) AS lower_n, CAST(sum(up) AS BIGINT) AS upper_n,
        |   CAST(sum(di) AS BIGINT) AS digit_n, CAST(sum(sp) AS BIGINT) AS space_n
        | FROM t GROUP BY lang)
        |SELECT lang, n_chars,
        | (lower_n * 1000000) // n_chars AS lower_ppm,
        | (upper_n * 1000000) // n_chars AS upper_ppm,
        | (digit_n * 1000000) // n_chars AS digit_ppm,
        | (space_n * 1000000) // n_chars AS space_ppm,
        | ((n_chars - lower_n - upper_n - digit_n - space_n) * 1000000) // n_chars
        |   AS other_ppm
        |FROM g ORDER BY lang""".stripMargin,
    "q_roc_curve" ->
      """WITH cnts AS (SELECT o_custkey, count(*) AS n_o FROM orders GROUP BY 1),
        |scored AS (
        | SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bc,
        |   CASE WHEN coalesce(n_o, 0) >= 8 THEN 1 ELSE 0 END AS y
        | FROM customer LEFT JOIN cnts ON c_custkey = o_custkey),
        |census AS (
        | SELECT bc, sum(y) AS pos, sum(1 - y) AS neg FROM scored GROUP BY bc),
        |cum AS (
        | SELECT bc,
        |  sum(pos) OVER (ORDER BY bc DESC ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS tp,
        |  sum(neg) OVER (ORDER BY bc DESC ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS fp
        | FROM census),
        |tot AS (
        | SELECT CAST(sum(y) AS BIGINT) AS p_tot,
        |   CAST(sum(1 - y) AS BIGINT) AS n_tot FROM scored),
        |ranked AS (
        | SELECT bc, row_number() OVER (ORDER BY bc DESC) AS rk
        | FROM (SELECT DISTINCT bc FROM scored) v),
        |nd AS (SELECT max(rk) AS n_vals FROM ranked),
        |thr AS (
        | SELECT bc, rk // greatest(n_vals // 20, 1) AS step
        | FROM ranked, nd
        | WHERE rk % greatest(n_vals // 20, 1) = 0
        |   AND rk // greatest(n_vals // 20, 1) <= 19)
        |SELECT CAST(step AS BIGINT) AS step, bc AS threshold_c,
        | CAST((tp * 1000000) // p_tot AS BIGINT) AS tpr_ppm,
        | CAST((fp * 1000000) // n_tot AS BIGINT) AS fpr_ppm
        |FROM thr JOIN cum USING (bc), tot
        |ORDER BY step""".stripMargin,
    "q_perm_test" ->
      """WITH base AS (
        | SELECT c_custkey AS ck,
        |   CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
        |   CAST(round(c_acctbal * 100) AS BIGINT) AS bc
        | FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |obs AS (
        | SELECT abs(CAST(sum(CASE WHEN g = 1 THEN bc END) AS DOUBLE)
        |     / sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
        |   - CAST(sum(CASE WHEN g = 0 THEN bc END) AS DOUBLE)
        |     / sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)) AS obs_gap
        | FROM base),
        |perms AS (
        | SELECT b,
        |  abs(CAST(sum(CASE WHEN gp = 1 THEN bc END) AS DOUBLE)
        |    / sum(CASE WHEN gp = 1 THEN 1 ELSE 0 END)
        |  - CAST(sum(CASE WHEN gp = 0 THEN bc END) AS DOUBLE)
        |    / sum(CASE WHEN gp = 0 THEN 1 ELSE 0 END)) AS gap
        | FROM (
        |  SELECT b, bc,
        |    CAST('0x' || substr(md5(CAST(b AS VARCHAR) || '_' || CAST(ck AS VARCHAR)), 1, 1)
        |      AS BIGINT) % 2 AS gp
        |  FROM base, range(1, 65) t(b)) e
        | GROUP BY b)
        |SELECT count(*) AS n_perms,
        | CAST(sum(CASE WHEN gap >= obs_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
        | CAST(round(any_value(obs_gap), 4) AS DOUBLE) AS obs_gap_c,
        | CAST((sum(CASE WHEN gap >= obs_gap THEN 1 ELSE 0 END) * 1000000) // count(*)
        |   AS BIGINT) AS p_ppm
        |FROM perms, obs""".stripMargin,
  )
}
