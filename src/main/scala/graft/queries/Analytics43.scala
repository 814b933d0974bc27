package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 25: Holt–Winters additive smoothing (the seasonal upgrade
  * of [[Analytics31.qHoltLinear]] — level, trend AND a rolling 7-slot
  * seasonal state folded through the `aggregate` HOF; the oracle
  * replays the identical recursion as a recursive CTE with a list
  * state, so ~2.4k steps of IEEE doubles match bitwise), and the
  * language distance matrix as pairwise Jensen–Shannon divergence over
  * char-trigram profiles (order-free integer µnat cells).
  */
object Analytics43 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Holt–Winters additive (α=0.3, β=0.05, γ=0.2, period 7) over daily
    * revenue: state = (level, trend, 7 seasonal slots) initialized
    * from the first week (s_i = y_i − l₀, l₀ = first-week mean, b₀ =
    * week-over-week mean shift / 7), folded over days 8..n. The
    * one-step-ahead forecast adds the next seasonal slot. Both engines
    * run the same textual recurrence — byte-identical trajectories
    * (the q_holt_linear argument, now with array state).
    *
    * 100 TB shape: fact → |days| array; the fold is the documented
    * bounded-frame sequential exception. */
  val qHoltWinters: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    daily.agg(
        count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, rev_c))), x -> CAST(x.rev_c AS DOUBLE))")
          .as("ys"))
      .withColumn("l0", expr(
        "aggregate(slice(ys, 1, 7), CAST(0.0 AS DOUBLE), (a, y) -> a + y) / 7"))
      .withColumn("b0", expr(
        """(aggregate(slice(ys, 8, 7), CAST(0.0 AS DOUBLE), (a, y) -> a + y) / 7
           - aggregate(slice(ys, 1, 7), CAST(0.0 AS DOUBLE), (a, y) -> a + y) / 7) / 7"""))
      .withColumn("fin", expr(
        """aggregate(
             transform(slice(ys, 8, size(ys) - 7),
               (y, i) -> named_struct('y', y, 't', i + 8)),
             named_struct('l', l0, 'b', b0,
               'sarr', transform(slice(ys, 1, 7), y -> y - l0)),
             (acc, e) -> named_struct(
               'l', 0.3 * (e.y - element_at(acc.sarr, CAST((e.t - 8) % 7 + 1 AS INT)))
                    + 0.7 * (acc.l + acc.b),
               'b', 0.05 * ((0.3 * (e.y - element_at(acc.sarr, CAST((e.t - 8) % 7 + 1 AS INT)))
                    + 0.7 * (acc.l + acc.b)) - acc.l) + 0.95 * acc.b,
               'sarr', transform(acc.sarr, (sv, j) ->
                 CASE WHEN j = CAST((e.t - 8) % 7 AS INT)
                   THEN 0.2 * (e.y - (0.3 * (e.y - element_at(acc.sarr, CAST((e.t - 8) % 7 + 1 AS INT)))
                        + 0.7 * (acc.l + acc.b))) + 0.8 * sv
                   ELSE sv END)))"""))
      .select(col("n_days"),
        expr("CAST(round(fin.l, 6) AS DOUBLE)").as("level"),
        expr("CAST(round(fin.b, 6) AS DOUBLE)").as("trend"),
        expr("""CAST(round(fin.l + fin.b
                + element_at(fin.sarr, CAST((n_days - 7) % 7 + 1 AS INT)), 6)
                AS DOUBLE)""").as("forecast_next"))
  }

  /** Language distance matrix: pairwise Jensen–Shannon divergence of
    * the char-trigram distributions, each cell term round(·10⁶) an
    * order-free integer µnat (the q_js_divergence discipline applied
    * per trigram), JS = Σ terms div 2. The 10-row readout every
    * multilingual mixing decision consults.
    *
    * 100 TB shape: one (lang, trigram) census; the pair stage joins
    * census-to-census on the trigram key (Σ|langs(tri)|² ≤ 25·|tris|),
    * never touching the corpus twice. */
  val qLangDistance: Q = (s, d) => {
    // fan out the one-row-group doc scan (the trigram explode is the
    // CPU-heavy map side) and checkpoint the census: tri feeds FIVE
    // consumers (totals, both sides of the shared-term join, both sides
    // of the B-only anti-join) — each otherwise replayed the full
    // explode + census (r15; measured 13 s of job time in a 3.9 s query)
    val tri = graft.operators.Scale.fanOutScan(Tables.documents(s, d))
      .select(col("lang"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, length(t) - 2), i -> substring(t, CAST(i AS INT), 3))")).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = tri.groupBy("lang").agg(sum("c").as("n"))
    // dense pair frame: for each lang pair, A-side terms come from a
    // left join (covers shared + A-only), B-only terms from an anti join
    val langs = tot.select(col("lang").as("l1"), col("n").as("n1"))
    val pairsFrame = langs.crossJoin(
        tot.select(col("lang").as("l2"), col("n").as("n2")))
      .filter(col("l1") < col("l2"))
    val terms = pairsFrame
      .join(tri.select(col("lang").as("l1"), col("tri"), col("c").as("c1")),
        Seq("l1"), "left")
      .join(tri.select(col("lang").as("l2"), col("tri").as("tri2"), col("c").as("c2"))
          .withColumnRenamed("tri2", "tri"),
        Seq("l2", "tri"), "left")
      .withColumn("c2", coalesce(col("c2"), lit(0L)))
      .withColumn("term_a", expr(
        """CASE WHEN c1 > 0 THEN CAST(round(
             (CAST(c1 AS DOUBLE) / n1) * ln((2.0 * (CAST(c1 AS DOUBLE) / n1))
               / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)) * 1000000)
             AS BIGINT) ELSE 0 END"""))
      .withColumn("term_b", expr(
        """CASE WHEN c2 > 0 THEN CAST(round(
             (CAST(c2 AS DOUBLE) / n2) * ln((2.0 * (CAST(c2 AS DOUBLE) / n2))
               / (CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2)) * 1000000)
             AS BIGINT) ELSE 0 END"""))
    val bOnly = pairsFrame
      .join(tri.select(col("lang").as("l2"), col("tri"), col("c").as("c2")),
        Seq("l2"))
      .join(tri.select(col("lang").as("l1"), col("tri").as("tri1"), col("c").as("c1"))
          .withColumnRenamed("tri1", "tri"),
        Seq("l1", "tri"), "left_anti")
      .withColumn("term_b", expr(
        """CAST(round((CAST(c2 AS DOUBLE) / n2) * ln(2.0) * 1000000) AS BIGINT)"""))
      .groupBy("l1", "l2").agg(sum("term_b").as("b_only_micro"))
    terms.groupBy("l1", "l2")
      .agg(sum("term_a").as("a_micro"), sum("term_b").as("shared_b_micro"))
      .join(bOnly, Seq("l1", "l2"), "left")
      .select(col("l1"), col("l2"),
        expr("""CAST((a_micro + shared_b_micro + coalesce(b_only_micro, 0)) div 2
                AS BIGINT)""").as("js_micro"))
      .orderBy("l1", "l2")
  }

  val all: Map[String, Q] = Map(
    "q_holt_winters" -> qHoltWinters,
    "q_lang_distance" -> qLangDistance,
  )

  val oracles: Map[String, String] = Map(
    "q_holt_winters" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |arr AS (
        | SELECT count(*) AS n_days,
        |   list(CAST(rev_c AS DOUBLE) ORDER BY day) AS ys
        | FROM daily),
        |init AS (
        | SELECT n_days, ys,
        |  list_sum(ys[1:7]) / 7 AS l0,
        |  (list_sum(ys[8:14]) / 7 - list_sum(ys[1:7]) / 7) / 7 AS b0,
        |  list_transform(ys[1:7], y -> y - list_sum(ys[1:7]) / 7) AS s0
        | FROM arr),
        |rec AS (
        | WITH RECURSIVE h(t, l, b, sarr) AS (
        |  SELECT 7, l0, b0, s0 FROM init
        |  UNION ALL
        |  SELECT t2, l2,
        |   0.05 * (l2 - l1) + 0.95 * b1,
        |   list_transform(sarr1, (sv, j) ->
        |     CASE WHEN j = CAST((t2 - 8) % 7 + 1 AS BIGINT)
        |       THEN 0.2 * (yv - l2) + 0.8 * sv ELSE sv END)
        |  FROM (
        |   SELECT h.t + 1 AS t2,
        |     0.3 * (init.ys[h.t + 1] - h.sarr[CAST((h.t + 1 - 8) % 7 + 1 AS INT)])
        |       + 0.7 * (h.l + h.b) AS l2,
        |     h.l AS l1, h.b AS b1, h.sarr AS sarr1,
        |     init.ys[h.t + 1] AS yv
        |   FROM h, init WHERE h.t < init.n_days))
        | SELECT * FROM h)
        |SELECT i.n_days,
        | CAST(round(r.l, 6) AS DOUBLE) AS level,
        | CAST(round(r.b, 6) AS DOUBLE) AS trend,
        | CAST(round(r.l + r.b + r.sarr[CAST((i.n_days - 7) % 7 + 1 AS INT)], 6)
        |   AS DOUBLE) AS forecast_next
        |FROM init i JOIN rec r ON r.t = i.n_days""".stripMargin,
    "q_lang_distance" ->
      """WITH tri AS (
        | SELECT lang, tri, count(*) AS c
        | FROM (SELECT lang, lower(text) AS t FROM documents
        |       WHERE length(text) >= 3) d,
        |  LATERAL (SELECT unnest(list_transform(range(1, length(t) - 1),
        |    i -> substring(t, CAST(i AS INT), 3))) AS tri) u
        | GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM tri GROUP BY lang),
        |pf AS (
        | SELECT a.lang AS l1, a.n AS n1, b.lang AS l2, b.n AS n2
        | FROM tot a CROSS JOIN tot b WHERE a.lang < b.lang),
        |shared AS (
        | SELECT pf.l1, pf.l2,
        |  CAST(sum(CASE WHEN ta.c > 0 THEN CAST(round(
        |    (CAST(ta.c AS DOUBLE) / n1) * ln((2.0 * (CAST(ta.c AS DOUBLE) / n1))
        |      / (CAST(ta.c AS DOUBLE) / n1 + CAST(coalesce(tb.c, 0) AS DOUBLE) / n2))
        |    * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS a_micro,
        |  CAST(sum(CASE WHEN coalesce(tb.c, 0) > 0 THEN CAST(round(
        |    (CAST(tb.c AS DOUBLE) / n2) * ln((2.0 * (CAST(tb.c AS DOUBLE) / n2))
        |      / (CAST(ta.c AS DOUBLE) / n1 + CAST(tb.c AS DOUBLE) / n2))
        |    * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS shared_b_micro
        | FROM pf
        | JOIN tri ta ON ta.lang = pf.l1
        | LEFT JOIN tri tb ON tb.lang = pf.l2 AND tb.tri = ta.tri
        | GROUP BY 1, 2),
        |bonly AS (
        | SELECT pf.l1, pf.l2,
        |  CAST(sum(CAST(round((CAST(tb.c AS DOUBLE) / n2) * ln(2.0) * 1000000)
        |    AS BIGINT)) AS BIGINT) AS b_only_micro
        | FROM pf JOIN tri tb ON tb.lang = pf.l2
        | WHERE NOT EXISTS (
        |   SELECT 1 FROM tri ta WHERE ta.lang = pf.l1 AND ta.tri = tb.tri)
        | GROUP BY 1, 2)
        |SELECT s.l1, s.l2,
        | CAST((a_micro + shared_b_micro + coalesce(b_only_micro, 0)) // 2
        |   AS BIGINT) AS js_micro
        |FROM shared s LEFT JOIN bonly USING (l1, l2)
        |ORDER BY l1, l2""".stripMargin,
  )
}
