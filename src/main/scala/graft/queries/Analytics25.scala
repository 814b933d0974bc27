package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** r9 batch 7 (closer): split-quality, dedup-governance, and
  * case-control readouts — all exact-integer ppm, zero float surface.
  */
object Analytics25 {
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Gini impurity of the event-type mix per user-activity decile —
    * the split-quality metric a decision-tree induction evaluates,
    * here reading "does engagement level predict the event mix":
    * 1 − Σ(cᵢ/n)² kept exact as (n² − Σcᵢ²)·10⁶ div n². Deciles from
    * per-user event counts via the exact-rank cut
    * ([[graft.operators.Scale]] denseIds discipline — ntile over the
    * bounded user frame).
    *
    * 100 TB shape: per-user reduce, decile rank window over the user
    * frame, then a (decile × type) census — all partial-agg'd. */
  val qGiniImpurity: Q = (s, d) => {
    val perUser = Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("n_ev"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_ev"), col("user_id"))
    val deciled = perUser.withColumn("decile",
      ntile(10).over(w).cast("long"))
    val census = Tables.events(s, d)
      .join(deciled.select(col("user_id"), col("decile")), "user_id")
      .groupBy(col("decile"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    census.groupBy("decile")
      .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sc2"))
      .select(col("decile"), col("n"), col("n_types"),
        expr("((n * n - sc2) * 1000000) div (n * n)").as("gini_ppm"))
      .orderBy("decile")
  }

  /** Dedup governance: per source, how much of the corpus is NEAR-dup
    * cluster LOSERS (non-canonical members of
    * [[graft.dedup.Dedup.dupClusters]] over the Jaccard pairs — the
    * corpus plants near-dups, not byte-identical copies, so the
    * near-dup rate is the live number) — the per-provenance
    * duplication-rate report a crawl-mix owner watches (a source whose
    * dup share spikes is re-crawling itself). Exact ppm integers.
    *
    * 100 TB shape: the checkpointed pair pipeline's loser set joined
    * back once; two partial-agg'd censuses. */
  val qDupRatio: Q = (s, d) => {
    import graft.dedup.Dedup
    val docs = Tables.documents(s, d)
    val losers = Dedup.dupClusters(Dedup.jaccardPairs(docs, 0.6, maxDf = 16))
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val lost = docs.join(losers, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_dups"))
    perSource.join(lost, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        expr("(coalesce(n_dups, 0) * 1000000) div n_docs").as("dup_ppm"))
      .orderBy("source")
  }

  /** Case-control odds ratio: does a document's id parity (the planted
    * "treatment") associate with passing the Gopher gate? OR =
    * (a·d)·10⁶ div (b·c) on the exact 2×2 table — the epidemiology
    * readout next to relative-risk-style rates, zero floats (the
    * integer-gate label arithmetic from q_classifier_eval).
    *
    * 100 TB shape: one 4-cell partial-agg'd census. */
  val qOddsRatio: Q = (s, d) => {
    import graft.text.TextFunctions
    val tk = col("tk")
    val lab = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        size(tk).cast("long").as("nt"),
        aggregate(tk, lit(0L), (a, t) => a + length(t)).as("charsum"),
        size(filter(tk, t => t.isin(
          TextFunctions.stopwords.map(_.asInstanceOf[Any]): _*)))
          .cast("long").as("ns"),
        size(array_distinct(tk)).cast("long").as("ndist"))
      .select(col("doc_id"),
        (col("nt") >= 30 && col("nt") <= 80 &&
          col("charsum") * 10 >= col("nt") * 39 &&
          col("charsum") * 10 <= col("nt") * 51 &&
          col("ns") >= 2 && col("ndist") * 2 >= col("nt")).cast("long")
          .as("label"),
        (col("doc_id") % 2).as("exposed"))
    lab.agg(
        sum(expr("CAST(exposed = 1 AND label = 1 AS BIGINT)")).as("a"),
        sum(expr("CAST(exposed = 1 AND label = 0 AS BIGINT)")).as("b"),
        sum(expr("CAST(exposed = 0 AND label = 1 AS BIGINT)")).as("c"),
        sum(expr("CAST(exposed = 0 AND label = 0 AS BIGINT)")).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        expr("(a * d * 1000000) div (b * c)").as("odds_ratio_ppm"),
        expr("((a * 1000000) div (a + b)) - ((c * 1000000) div (c + d))")
          .as("risk_diff_ppm"))
  }

  val all: Map[String, Q] = Map(
    "q_gini_impurity" -> qGiniImpurity,
    "q_dup_ratio" -> qDupRatio,
    "q_odds_ratio" -> qOddsRatio,
  )

  val oracles: Map[String, String] = Map(
    "q_gini_impurity" ->
      """WITH per_user AS (
        | SELECT user_id, count(*) AS n_ev FROM events GROUP BY user_id),
        |deciled AS (
        | SELECT user_id, CAST(ntile(10) OVER (ORDER BY n_ev, user_id)
        |   AS BIGINT) AS decile
        | FROM per_user),
        |census AS (
        | SELECT d.decile, e.event_type, count(*) AS c
        | FROM events e JOIN deciled d USING (user_id)
        | GROUP BY 1, 2)
        |SELECT decile, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_types,
        | CAST(((sum(c) * sum(c) - sum(c * c)) * 1000000)
        |   // (sum(c) * sum(c)) AS BIGINT) AS gini_ppm
        |FROM census GROUP BY decile ORDER BY decile""".stripMargin,
    "q_dup_ratio" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS shingle FROM sh),
        |common AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.nsh AS na, b.nsh AS nb,
        |        count(*) AS c
        | FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1, 2, 3, 4),
        |pairs AS (
        | SELECT a_id, b_id FROM common WHERE CAST(c AS DOUBLE)/(na+nb-c) >= 0.6),
        |edges AS (
        | SELECT a_id AS src, b_id AS dst FROM pairs
        | UNION ALL
        | SELECT b_id, a_id FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |r(id, n) AS (
        | SELECT id, id FROM nodes
        | UNION
        | SELECT r.id, e2.dst FROM r JOIN edges e2 ON e2.src = r.n),
        |losers AS (
        | SELECT id AS doc_id FROM (
        |  SELECT id, min(n) AS cluster_id FROM r GROUP BY id)
        | WHERE id <> cluster_id),
        |per_source AS (
        | SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |lost AS (
        | SELECT d.source, count(*) AS n_dups
        | FROM documents d JOIN losers l USING (doc_id) GROUP BY d.source)
        |SELECT p.source, p.n_docs,
        | CAST(coalesce(l.n_dups, 0) AS BIGINT) AS n_dups,
        | CAST((coalesce(l.n_dups, 0) * 1000000) // p.n_docs AS BIGINT)
        |   AS dup_ppm
        |FROM per_source p LEFT JOIN lost l USING (source)
        |ORDER BY p.source""".stripMargin,
    "q_odds_ratio" ->
      """WITH st AS (
        | SELECT doc_id, len(tk) AS nt,
        |  CAST(list_aggregate(list_transform(tk, t -> strlen(t)), 'sum')
        |    AS BIGINT) AS charsum,
        |  len(list_filter(tk,
        |    t -> t IN ('the', 'a', 'data', 'row', 'value'))) AS ns,
        |  len(list_distinct(tk)) AS ndist
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |       FROM documents)),
        |lab AS (
        | SELECT doc_id % 2 AS exposed,
        |  CAST(nt >= 30 AND nt <= 80 AND charsum * 10 >= nt * 39
        |   AND charsum * 10 <= nt * 51 AND ns >= 2 AND ndist * 2 >= nt
        |   AS BIGINT) AS label
        | FROM st),
        |cells AS (
        | SELECT
        |  CAST(sum(CASE WHEN exposed = 1 AND label = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS a,
        |  CAST(sum(CASE WHEN exposed = 1 AND label = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN exposed = 0 AND label = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c,
        |  CAST(sum(CASE WHEN exposed = 0 AND label = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS d
        | FROM lab)
        |SELECT a, b, c, d,
        | CAST((a * d * 1000000) // (b * c) AS BIGINT) AS odds_ratio_ppm,
        | CAST(((a * 1000000) // (a + b)) - ((c * 1000000) // (c + d))
        |   AS BIGINT) AS risk_diff_ppm
        |FROM cells""".stripMargin,
  )
}
