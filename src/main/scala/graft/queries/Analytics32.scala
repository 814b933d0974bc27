package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions.tokens

/** r9 batch 14: the stylometry/classification layer over `documents` —
  * a pure-SQL multinomial naive Bayes (trained AND scored inside the
  * engine), Simpson lexical concentration, Burrows' Delta authorship
  * distance, a char-trigram language fingerprint, and hapax statistics.
  * The micro-nat discipline carries the only transcendentals (one
  * rounded ln per census CELL, summed as exact integers — order-free);
  * everything else is integer ppm/micro arithmetic.
  */
object Analytics32 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Multinomial naive Bayes language classifier, trained on even
    * doc_ids and scored on odd ones, entirely in the engine: Laplace-
    * smoothed per-(token,lang) weights round(ln((c+1)/(T_l+V))·10⁶)
    * are INTEGER micro-nats, so each document's class score is an
    * exact integer sum (order-free) plus the integer prior — argmax
    * and the resulting confusion matrix are engine-exact. Test tokens
    * outside the train vocabulary are dropped (documented; the
    * standard "ignore OOV" convention).
    *
    * 100 TB shape: the model is a |V|×|langs| weight grid built from
    * one token census (the 5-row lang-stats frame broadcasts onto the
    * vocab — never a shuffle); scoring is explode → grid equi-join →
    * per-doc sum → 5-row-per-doc argmax window. Vocab at corpus scale
    * gets a maxDf/minDf cap upstream (the q_dedup_jaccard governor). */
  val qNaiveBayes: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val cnt = train.groupBy("w", "lang").agg(count(lit(1)).as("c"))
    val langStats = train.groupBy("lang")
      .agg(count(lit(1)).as("t_l"), countDistinct("doc_id").as("d_l"))
    val v = cnt.select("w").distinct()
    val vSize = v.agg(count(lit(1)).as("v_size"))
    val dTot = langStats.agg(sum("d_l").as("d_tot"))
    val grid = v.crossJoin(broadcast(langStats))
      .join(broadcast(vSize))
      .join(cnt, Seq("w", "lang"), "left")
      .select(col("w"), col("lang"),
        expr("""CAST(round(ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) / (t_l + v_size))
                * 1000000) AS BIGINT)""").as("w_micro"))
    val priors = langStats.join(broadcast(dTot))
      .select(col("lang"),
        expr("CAST(round(ln(CAST(d_l AS DOUBLE) / d_tot) * 1000000) AS BIGINT)")
          .as("prior_micro"))
    val test = docs.filter(col("doc_id") % 2 === 1)
    val scores = test.withColumnRenamed("lang", "actual")
      .join(grid.withColumnRenamed("lang", "cand"), Seq("w"))
      .groupBy(col("doc_id"), col("actual"), col("cand"))
      .agg(sum("w_micro").as("tok_micro"))
      .join(broadcast(priors.withColumnRenamed("lang", "cand")), Seq("cand"))
      .withColumn("score", col("tok_micro") + col("prior_micro"))
    val wArg = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand"))
    scores.withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .groupBy(col("actual"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("actual", "predicted")
  }

  /** Simpson concentration of the token distribution per source —
    * the repeated-draw collision probability D = Σc(c−1)/(N(N−1)),
    * EXACT integer ppm (the diversity complement of q_token_entropy's
    * Shannon readout, with zero transcendentals).
    *
    * 100 TB shape: one map-side-combinable token census, one 20-row
    * readout; the ppm division is one DECIMAL div per source. */
  val qSimpsonDiversity: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    cnt.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).as("coll"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        expr("""CAST((coll * 1000000)
                div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)) AS BIGINT)""")
          .as("simpson_ppm"))
      .orderBy("source")
  }

  /** Burrows' Delta (2002) authorship distance between sources over
    * the 50 globally most frequent tokens: per-source relative
    * frequencies in exact ppm, per-token z-scores from the integer
    * moment pair (Σf, Σf²) across the 20 sources, z in rounded
    * integer micro units, and Delta(s₁,s₂) = mean |z₁−z₂| — so the
    * whole pairwise matrix is integer arithmetic after one rounded
    * sqrt per token row.
    *
    * 100 TB shape: token census → top-50 (TakeOrderedAndProject) →
    * 50×20 feature frame; the pairwise join is 190 rows. */
  val qBurrowsDelta: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val top = toks.groupBy("w").agg(count(lit(1)).as("gc"))
      .orderBy(col("gc").desc, col("w")).limit(50).select("w")
    val srcTot = toks.groupBy("source").agg(count(lit(1)).as("n_s"))
    val cells = toks.join(broadcast(top), "w")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    // densify: every (top-token × source) cell exists, zeros included
    val fFixed = top.crossJoin(broadcast(srcTot))
      .join(cells, Seq("source", "w"), "left")
      .select(col("w"), col("source"),
        expr("(coalesce(c, 0) * 1000000) div n_s").as("f_ppm"))
    val m = fFixed.groupBy("w")
      .agg(count(lit(1)).as("k"), sum("f_ppm").as("sf"),
        sum(col("f_ppm") * col("f_ppm")).as("sff"))
    val z = fFixed.join(broadcast(m), "w")
      .select(col("w"), col("source"),
        expr("""CAST(round((f_ppm - CAST(sf AS DOUBLE) / k)
                / sqrt((CAST(sff AS DOUBLE) - CAST(sf AS DOUBLE) * (CAST(sf AS DOUBLE) / k))
                       / (k - 1))
                * 1000000) AS BIGINT)""").as("z_micro"))
    z.as("a").join(z.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(expr("sum(abs(a.z_micro - b.z_micro)) div count(1)").as("delta_micro"))
      .orderBy("s1", "s2")
  }

  /** Character-trigram fingerprint: the 5 most frequent trigrams per
    * language with exact ppm rates — the profile table a Cavnar–
    * Trenkle language identifier ranks against (q_lang_id applies the
    * heuristic; this emits the evidence). Trigrams explode via
    * sequence+substring (codegen'd, no UDF); rank ties break on the
    * trigram string.
    *
    * 100 TB shape: explode is 1:~n_chars but collapses immediately
    * into a map-side-combinable (lang, tri) census; top-5 is a
    * 5-partition WindowGroupLimit. */
  val qCharTrigrams: Q = (s, d) => {
    // fan out the one-row-group doc scan (r16): the ~n_chars trigram
    // explode + census map side otherwise runs single-task (measured
    // 2.4 s of the query's 2.9 s in ONE 1-task job at sf0.1)
    val tri = graft.operators.Scale.fanOutScan(Tables.documents(s, d))
      .select(col("lang"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
    val cnt = tri.groupBy("lang", "tri").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("lang").agg(sum("c").as("n_tri"))
    val wr = Window.partitionBy("lang").orderBy(col("c").desc, col("tri"))
    cnt.join(tot, "lang")
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn").cast("long").as("rank"), col("tri"), col("c"),
        expr("CAST((c * 1000000) div n_tri AS BIGINT)").as("ppm"))
      .orderBy("lang", "rank")
  }

  /** Hapax legomena statistics per source: vocabulary size, tokens
    * seen exactly once, the hapax share of the vocabulary (Zipf's
    * long tail in one number), and the token count — all exact
    * integers.
    *
    * 100 TB shape: token census → count-of-counts; both aggs are
    * map-side combinable. */
  val qHapax: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab"),
        sum((col("c") === 1).cast("long")).as("hapax"),
        sum("c").as("n_tokens"))
      .withColumn("hapax_ppm", expr("(hapax * 1000000) div vocab"))
      .orderBy("source")
  }

  val all: Map[String, Q] = Map(
    "q_naive_bayes" -> qNaiveBayes,
    "q_simpson_diversity" -> qSimpsonDiversity,
    "q_burrows_delta" -> qBurrowsDelta,
    "q_char_trigrams" -> qCharTrigrams,
    "q_hapax" -> qHapax,
  )

  val oracles: Map[String, String] = Map(
    "q_naive_bayes" ->
      """WITH docs AS (
        | SELECT doc_id, lang, w
        | FROM (SELECT doc_id, lang,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0),
        |train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
        |cnt AS (SELECT w, lang, count(*) AS c FROM train GROUP BY 1, 2),
        |ls AS (
        | SELECT lang, count(*) AS t_l, count(DISTINCT doc_id) AS d_l
        | FROM train GROUP BY lang),
        |v AS (SELECT DISTINCT w FROM cnt),
        |vs AS (SELECT count(*) AS v_size FROM v),
        |dt AS (SELECT sum(d_l) AS d_tot FROM ls),
        |grid AS (
        | SELECT v.w, ls.lang,
        |   CAST(round(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (ls.t_l + vs.v_size))
        |     * 1000000) AS BIGINT) AS w_micro
        | FROM v CROSS JOIN ls CROSS JOIN vs
        | LEFT JOIN cnt c ON c.w = v.w AND c.lang = ls.lang),
        |priors AS (
        | SELECT lang AS cand,
        |   CAST(round(ln(CAST(d_l AS DOUBLE) / d_tot) * 1000000) AS BIGINT)
        |     AS prior_micro
        | FROM ls, dt),
        |test AS (SELECT doc_id, lang AS actual, w FROM docs WHERE doc_id % 2 = 1),
        |sc AS (
        | SELECT t.doc_id, t.actual, g.lang AS cand,
        |   CAST(sum(g.w_micro) AS BIGINT) + any_value(p.prior_micro) AS score
        | FROM test t JOIN grid g ON t.w = g.w
        | JOIN priors p ON p.cand = g.lang
        | GROUP BY 1, 2, 3),
        |arg AS (
        | SELECT doc_id, actual, cand,
        |   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        | FROM sc)
        |SELECT actual, cand AS predicted, count(*) AS n_docs
        |FROM arg WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin,
    "q_simpson_diversity" ->
      """WITH cnt AS (
        | SELECT source, w, count(*) AS c
        | FROM (SELECT source,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0 GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        | count(*) AS vocab,
        | CAST((CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT) * 1000000)
        |   // (CAST(sum(c) AS HUGEINT) * (sum(c) - 1)) AS BIGINT) AS simpson_ppm
        |FROM cnt GROUP BY source ORDER BY source""".stripMargin,
    "q_burrows_delta" ->
      """WITH toks AS (
        | SELECT source, w
        | FROM (SELECT source,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0),
        |top AS (
        | SELECT w FROM (SELECT w, count(*) AS gc FROM toks GROUP BY w)
        | ORDER BY gc DESC, w LIMIT 50),
        |st AS (SELECT source, count(*) AS n_s FROM toks GROUP BY source),
        |cells AS (
        | SELECT t.source, t.w, count(*) AS c
        | FROM toks t JOIN top USING (w) GROUP BY 1, 2),
        |f AS (
        | SELECT top.w, st.source,
        |   (coalesce(c.c, 0) * 1000000) // st.n_s AS f_ppm
        | FROM top CROSS JOIN st
        | LEFT JOIN cells c ON c.w = top.w AND c.source = st.source),
        |m AS (
        | SELECT w, count(*) AS k, sum(f_ppm) AS sf, sum(f_ppm * f_ppm) AS sff
        | FROM f GROUP BY w),
        |z AS (
        | SELECT f.w, f.source,
        |   CAST(round((f_ppm - CAST(sf AS DOUBLE) / k)
        |     / sqrt((CAST(sff AS DOUBLE) - CAST(sf AS DOUBLE) * (CAST(sf AS DOUBLE) / k))
        |            / (k - 1))
        |     * 1000000) AS BIGINT) AS z_micro
        | FROM f JOIN m USING (w))
        |SELECT a.source AS s1, b.source AS s2,
        | CAST(sum(abs(a.z_micro - b.z_micro)) // count(*) AS BIGINT) AS delta_micro
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY s1, s2""".stripMargin,
    "q_char_trigrams" ->
      """WITH tri AS (
        | SELECT lang, tri
        | FROM (SELECT lang, lower(text) AS t FROM documents
        |       WHERE length(text) >= 3) d,
        |  LATERAL (SELECT unnest(list_transform(range(1, length(t) - 1),
        |    i -> substring(t, CAST(i AS INT), 3))) AS tri) u),
        |cnt AS (SELECT lang, tri, count(*) AS c FROM tri GROUP BY 1, 2),
        |tot AS (SELECT lang, sum(c) AS n_tri FROM cnt GROUP BY lang),
        |ranked AS (
        | SELECT c.lang, tri, c,
        |   row_number() OVER (PARTITION BY c.lang ORDER BY c DESC, tri) AS rn,
        |   n_tri
        | FROM cnt c JOIN tot USING (lang))
        |SELECT lang, CAST(rn AS BIGINT) AS rank, tri, CAST(c AS BIGINT) AS c,
        | CAST((c * 1000000) // n_tri AS BIGINT) AS ppm
        |FROM ranked WHERE rn <= 5 ORDER BY lang, rank""".stripMargin,
    "q_hapax" ->
      """WITH cnt AS (
        | SELECT source, w, count(*) AS c
        | FROM (SELECT source,
        |         unnest(string_split_regex(trim(text), '\s+')) AS w
        |       FROM documents) u
        | WHERE length(w) > 0 GROUP BY 1, 2)
        |SELECT source, count(*) AS vocab,
        | CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        | CAST(sum(c) AS BIGINT) AS n_tokens,
        | CAST((sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000) // count(*)
        |   AS BIGINT) AS hapax_ppm
        |FROM cnt GROUP BY source ORDER BY source""".stripMargin,
  )
}
