package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 27: EMA crossover signals (dual-recursion fold with a
  * sign-change counter in the state), knee-point detection by exact
  * integer chord cross-products, and Church–Gale term burstiness.
  */
object Analytics45 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Fast/slow EMA crossover census over daily revenue (α = 2/8 and
    * 2/29 as exact decimal literals 0.25 / 0.0689655172413793): ONE
    * fold carries both EMAs, the previous spread sign, and the
    * golden/death cross counters — the trading-signal summary. Both
    * engines run the identical recurrence (q_holt_linear argument).
    *
    * 100 TB shape: |days| fold, the documented sequential exception. */
  val qEmaCrossover: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
    daily.agg(
        count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, rev_c))), x -> CAST(x.rev_c AS DOUBLE))")
          .as("ys"))
      .withColumn("fin", expr(
        """aggregate(slice(ys, 2, size(ys) - 1),
           named_struct('f', element_at(ys, 1), 's', element_at(ys, 1),
             'sgn', 0, 'up', CAST(0 AS BIGINT), 'down', CAST(0 AS BIGINT)),
           (acc, y) -> named_struct(
             'f', 0.25E0 * y + 0.75E0 * acc.f,
             's', 0.0689655172413793E0 * y + 0.9310344827586207E0 * acc.s,
             'sgn', CASE WHEN 0.25E0 * y + 0.75E0 * acc.f
                 > 0.0689655172413793E0 * y + 0.9310344827586207E0 * acc.s THEN 1
               WHEN 0.25E0 * y + 0.75E0 * acc.f
                 < 0.0689655172413793E0 * y + 0.9310344827586207E0 * acc.s THEN -1
               ELSE acc.sgn END,
             'up', acc.up + CASE WHEN acc.sgn = -1
               AND 0.25E0 * y + 0.75E0 * acc.f
                 > 0.0689655172413793E0 * y + 0.9310344827586207E0 * acc.s
               THEN 1 ELSE 0 END,
             'down', acc.down + CASE WHEN acc.sgn = 1
               AND 0.25E0 * y + 0.75E0 * acc.f
                 < 0.0689655172413793E0 * y + 0.9310344827586207E0 * acc.s
               THEN 1 ELSE 0 END))"""))
      .select(col("n_days"),
        expr("CAST(round(fin.f, 6) AS DOUBLE)").as("ema_fast"),
        expr("CAST(round(fin.s, 6) AS DOUBLE)").as("ema_slow"),
        expr("fin.up").as("golden_crosses"),
        expr("fin.down").as("death_crosses"),
        expr("CAST(fin.sgn AS BIGINT)").as("final_sign"))
  }

  /** Knee/elbow point of the cumulative revenue-share curve over
    * ranked parts: the rank maximizing the distance to the chord from
    * (0, 0) to (K, total) — with the chord fixed, argmax of the EXACT
    * integer cross product |k·total − K·cum| (no sqrt, no floats).
    * The "how many head parts matter" cutoff selector.
    *
    * 100 TB shape: one |parts| rank window + cumsum, one argmax. */
  val qKneePoint: Q = (s, d) => {
    val perPart = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rev").desc, col("pk"))
    val ranked = perPart
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum", sum("rev").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val tot = perPart.agg(count(lit(1)).as("kk"), sum("rev").as("total"))
    ranked.join(broadcast(tot))
      .withColumn("cross", expr(
        "abs(CAST(k AS DECIMAL(38,0)) * total - CAST(kk AS DECIMAL(38,0)) * cum)"))
      .orderBy(col("cross").desc, col("k"))
      .limit(1)
      .select(col("k").as("knee_rank"), col("kk").as("n_parts"),
        expr("(cum * 1000000) div total").as("share_at_knee_ppm"),
        expr("(k * 1000000) div kk").as("rank_share_ppm"))
  }

  /** Church–Gale term burstiness: for tokens in ≥5 documents, the
    * mean within-document repetition cf·10⁶ div df — words that clump
    * (hapax-heavy corpora score 10⁶; templates and topics score far
    * above). Top 20 by burstiness (ties on token).
    *
    * 100 TB shape: one (token, doc) census → token census; top-k via
    * TakeOrderedAndProject. */
  val qTermBurstiness: Q = (s, d) => {
    val td = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    td.groupBy("w")
      .agg(sum("c").as("cf"), count(lit(1)).as("df"))
      .filter(col("df") >= 5)
      .withColumn("burstiness_ppm", expr("(cf * 1000000) div df"))
      .orderBy(col("burstiness_ppm").desc, col("w"))
      .limit(20)
  }

  val all: Map[String, Q] = Map(
    "q_ema_crossover" -> qEmaCrossover,
    "q_knee_point" -> qKneePoint,
    "q_term_burstiness" -> qTermBurstiness,
  )

  val oracles: Map[String, String] = Map(
    "q_ema_crossover" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        | FROM orders GROUP BY 1),
        |arr AS (
        | SELECT count(*) AS n_days, list(CAST(rev_c AS DOUBLE) ORDER BY day) AS ys
        | FROM daily),
        |rec AS (
        | WITH RECURSIVE h(t, f, s, sgn, up, down) AS (
        |  SELECT 1, ys[1], ys[1], 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM arr
        |  UNION ALL
        |  SELECT t2, f2, s2,
        |   CASE WHEN f2 > s2 THEN 1 WHEN f2 < s2 THEN -1 ELSE sgn1 END,
        |   up1 + CASE WHEN sgn1 = -1 AND f2 > s2 THEN 1 ELSE 0 END,
        |   down1 + CASE WHEN sgn1 = 1 AND f2 < s2 THEN 1 ELSE 0 END
        |  FROM (
        |   SELECT h.t + 1 AS t2,
        |     0.25E0 * arr.ys[h.t + 1] + 0.75E0 * h.f AS f2,
        |     0.0689655172413793E0 * arr.ys[h.t + 1]
        |       + 0.9310344827586207E0 * h.s AS s2,
        |     h.sgn AS sgn1, h.up AS up1, h.down AS down1
        |   FROM h, arr WHERE h.t < arr.n_days))
        | SELECT * FROM h)
        |SELECT a.n_days,
        | CAST(round(r.f, 6) AS DOUBLE) AS ema_fast,
        | CAST(round(r.s, 6) AS DOUBLE) AS ema_slow,
        | r.up AS golden_crosses, r.down AS death_crosses,
        | CAST(r.sgn AS BIGINT) AS final_sign
        |FROM arr a JOIN rec r ON r.t = a.n_days""".stripMargin,
    "q_knee_point" ->
      """WITH pp AS (
        | SELECT l_partkey AS pk,
        |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
        | FROM lineitem GROUP BY 1),
        |ranked AS (
        | SELECT pk, rev,
        |  row_number() OVER (ORDER BY rev DESC, pk) AS k,
        |  sum(rev) OVER (ORDER BY rev DESC, pk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM pp),
        |tot AS (SELECT count(*) AS kk, CAST(sum(rev) AS BIGINT) AS total FROM pp)
        |SELECT CAST(k AS BIGINT) AS knee_rank, CAST(kk AS BIGINT) AS n_parts,
        | CAST((cum * 1000000) // total AS BIGINT) AS share_at_knee_ppm,
        | CAST((k * 1000000) // kk AS BIGINT) AS rank_share_ppm
        |FROM ranked, tot
        |ORDER BY abs(CAST(k AS HUGEINT) * total - CAST(kk AS HUGEINT) * cum) DESC, k
        |LIMIT 1""".stripMargin,
    "q_term_burstiness" ->
      """WITH td AS (
        | SELECT w, doc_id, count(*) AS c
        | FROM (SELECT doc_id,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0 GROUP BY 1, 2),
        |tc AS (
        | SELECT w, CAST(sum(c) AS BIGINT) AS cf, count(*) AS df
        | FROM td GROUP BY w)
        |SELECT w, cf, df, (cf * 1000000) // df AS burstiness_ppm
        |FROM tc WHERE df >= 5
        |ORDER BY burstiness_ppm DESC, w LIMIT 20""".stripMargin,
  )
}
