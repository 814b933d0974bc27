package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.text.TextFunctions.tokens

/** r7u batch — cohort lifetime value (the revenue-accumulation
  * complement to q_retention_cohorts' headcounts) and pairwise source
  * vocabulary overlap (the domain-similarity signal behind corpus
  * mixing weights).
  */
object Analytics10 {
  type Q = (SparkSession, String) => DataFrame

  /** Daily-cohort LTV: users grouped by their FIRST signup day; per
    * (cohort day, day offset) the purchasing-user count, that day's
    * exact-cent revenue, and the cohort's cumulative revenue by offset —
    * the curve a growth report plots. Daily cohorts because the events
    * table spans one month; the shape is cadence-agnostic.
    *
    * 100 TB shape: first-signup is one user-keyed min-agg (no window);
    * purchases join the (user → cohort) map on user_id; the cumulative
    * window runs on the |cohorts|×|offsets| aggregate. */
  val qCohortLtv: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val daily = purchases.join(cohort, "user_id")
      .filter(col("day") >= col("cohort_day"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("offset_days"))
      .agg(countDistinct("user_id").as("n_buyers"), sum("cents").as("revenue_c"))
    val w = Window.partitionBy("cohort_day").orderBy("offset_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_revenue_c", sum("revenue_c").over(w))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"), col("n_buyers"), col("revenue_c"), col("cum_revenue_c"))
      .orderBy("cohort_day", "offset_days")
  }

  /** Pairwise source vocabulary overlap: distinct-token Jaccard for the
    * top source pairs — near-duplicate FEEDS (mirrors, scrapes of the
    * same upstream) show up here before any document-level dedup runs.
    * Built from the (token, source) inverted index: the intersection is
    * an equality self-join on token, never a vocabulary cross-product.
    *
    * 100 TB shape: vocab per source is a distinct-agg; the token-keyed
    * self-join's fan-out is bounded by per-token source counts (≤
    * |sources|); the report is |sources|² max. */
  val qSourceVocabOverlap: Q = (s, d) => {
    val ts = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .distinct()
    val vocab = ts.groupBy("source").agg(count(lit(1)).as("v"))
    val inter = ts.select(col("token"), col("source").as("s1"))
      .join(ts.select(col("token"), col("source").as("s2")), Seq("token"))
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("n_inter"))
    inter
      .join(vocab.select(col("source").as("s1"), col("v").as("v1")), Seq("s1"))
      .join(vocab.select(col("source").as("s2"), col("v").as("v2")), Seq("s2"))
      .select(col("s1"), col("s2"), col("n_inter"), col("v1"), col("v2"),
        round(col("n_inter").cast("double") /
          (col("v1") + col("v2") - col("n_inter")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("s1"), col("s2"))
      .limit(20)
  }

  /** Matryoshka truncation recall (r7u): overlap@10 between the
    * full-64-dim and truncated-32-dim cosine rankings per query — the
    * measurement that justifies (or vetoes) storing half-precision
    * prefixes of an embedding column at 100 TB (half the bytes scanned
    * per ANN probe if recall holds). Both rankings run the certified
    * brute-force path; the oracle replays both in DuckDB and counts the
    * same intersections. */
  val qMatryoshka: Q = (s, d) => {
    import graft.similarity.Similarity
    val vecs = Tables.embeddings(s, d)
    val qs = vecs.filter(col("vec_id") < 5)
    val vecsHalf = vecs.withColumn("embedding", slice(col("embedding"), 1, 32))
    val qsHalf = vecsHalf.filter(col("vec_id") < 5)
    val full = Similarity.bruteTopK(vecs, qs, 10).select(col("q_id"), col("n_id"))
    val half = Similarity.bruteTopK(vecsHalf, qsHalf, 10)
      .select(col("q_id"), col("n_id"))
    val overlap = full.join(half, Seq("q_id", "n_id"))
      .groupBy("q_id").agg(count(lit(1)).as("overlap_at_10"))
    qs.select(col("vec_id").as("q_id"))
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("overlap_at_10"), lit(0L)).as("overlap_at_10"))
      .orderBy("q_id")
  }

  /** Pairwise audience overlap (r7w): exact user-set Jaccard between
    * event types — which behaviors share an audience (the product-
    * analytics sibling of source vocabulary overlap, same inverted-
    * index shape on (user, type) with |types|-bounded fan-out). */
  val qAudienceOverlap: Q = (s, d) => {
    val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
    val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("n_users"))
    val inter = ut.select(col("user_id"), col("event_type").as("t1"))
      .join(ut.select(col("user_id"), col("event_type").as("t2")), Seq("user_id"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n_both"))
    inter
      .join(sizes.select(col("event_type").as("t1"), col("n_users").as("n1")), Seq("t1"))
      .join(sizes.select(col("event_type").as("t2"), col("n_users").as("n2")), Seq("t2"))
      .select(col("t1"), col("t2"), col("n_both"), col("n1"), col("n2"),
        round(col("n_both").cast("double") /
          (col("n1") + col("n2") - col("n_both")), 6).as("jaccard"))
      .orderBy("t1", "t2")
  }

  /** Sample-ratio-mismatch guard (r7w): the experimentation sanity
    * check run BEFORE reading any A/B metric — assignment here is the
    * deterministic user-parity split, expected 50/50; the statistic is
    * the exact chi-square numerator (n_a − n_b)² over n cross-
    * multiplied to integers, with the α=0.05 1-dof decision
    * ((n_a−n_b)² > 3.8415·n) evaluated on exact integers scaled by
    * 10⁴. An SRM flag means the assignment plumbing is broken and
    * every downstream metric is garbage. */
  val qAbSrm: Q = (s, d) => {
    Tables.events(s, d)
      .select(col("user_id")).distinct()
      .select(pmod(col("user_id"), lit(2L)).as("arm"))
      .groupBy("arm").agg(count(lit(1)).as("n"))
      .agg(sum("n").as("n_total"),
        sum(when(col("arm") === 0, col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("n_b"))
      .select(col("n_total"), col("n_a"), col("n_b"),
        round((col("n_a") - col("n_b")).cast("double") *
          (col("n_a") - col("n_b")) / col("n_total"), 6).as("chi2_1dof"),
        ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) * 10000L >
          col("n_total") * 38415L).cast("long").as("srm_flag"))
  }

  val all: Map[String, Q] = Map(
    "q_cohort_ltv" -> qCohortLtv,
    "q_source_vocab_overlap" -> qSourceVocabOverlap,
    "q_matryoshka" -> qMatryoshka,
    "q_audience_overlap" -> qAudienceOverlap,
    "q_ab_srm" -> qAbSrm,
  )

  val oracles: Map[String, String] = Map(
    "q_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sizes AS (SELECT event_type, count(*) AS n_users FROM ut GROUP BY event_type),
        |inter AS (
        | SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
        | FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        | GROUP BY t1, t2)
        |SELECT t1, t2, n_both, s1.n_users AS n1, s2.n_users AS n2,
        | round(CAST(n_both AS DOUBLE) / (s1.n_users + s2.n_users - n_both), 6) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON t1 = s1.event_type
        |JOIN sizes s2 ON t2 = s2.event_type
        |ORDER BY t1, t2""".stripMargin,
    "q_ab_srm" ->
      """WITH arms AS (
        | SELECT user_id % 2 AS arm FROM (SELECT DISTINCT user_id FROM events)),
        |counts AS (SELECT arm, count(*) AS n FROM arms GROUP BY arm),
        |agg AS (
        | SELECT sum(n) AS n_total,
        |  sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS n_a,
        |  sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS n_b
        | FROM counts)
        |SELECT CAST(n_total AS BIGINT) AS n_total, CAST(n_a AS BIGINT) AS n_a,
        | CAST(n_b AS BIGINT) AS n_b,
        | round(CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / n_total, 6) AS chi2_1dof,
        | CASE WHEN (n_a - n_b) * (n_a - n_b) * 10000 > n_total * 38415
        |      THEN 1 ELSE 0 END AS srm_flag
        |FROM agg""".stripMargin,
    "q_matryoshka" ->
      """WITH vf AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        | FROM embeddings),
        |vh AS (
        | SELECT vec_id, embedding[1:32] AS emb,
        |  sqrt(list_sum(list_transform(embedding[1:32], x -> x::DOUBLE * x::DOUBLE))) AS nrm
        | FROM embeddings),
        |ff AS (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |   round(list_sum(list_transform(range(1, len(q.embedding) + 1),
        |     i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (q.nrm * c.nrm), 6)
        |   DESC, c.vec_id) AS rnk
        | FROM vf q JOIN vf c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |hh AS (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |   round(list_sum(list_transform(range(1, len(q.emb) + 1),
        |     i -> q.emb[i]::DOUBLE * c.emb[i]::DOUBLE)) / (q.nrm * c.nrm), 6)
        |   DESC, c.vec_id) AS rnk
        | FROM vh q JOIN vh c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |ov AS (
        | SELECT f.q_id, count(*) AS overlap_at_10
        | FROM (SELECT q_id, n_id FROM ff WHERE rnk <= 10) f
        | JOIN (SELECT q_id, n_id FROM hh WHERE rnk <= 10) h
        |   ON f.q_id = h.q_id AND f.n_id = h.n_id
        | GROUP BY f.q_id)
        |SELECT q.vec_id AS q_id,
        | CAST(coalesce(ov.overlap_at_10, 0) AS BIGINT) AS overlap_at_10
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 5) q
        |LEFT JOIN ov ON q.vec_id = ov.q_id
        |ORDER BY q_id""".stripMargin,
    "q_cohort_ltv" ->
      """WITH cohort AS (
        | SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        | FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |purchases AS (
        | SELECT user_id, CAST(ts AS DATE) AS day,
        |   CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events WHERE event_type = 'purchase'),
        |daily AS (
        | SELECT cohort_day, date_diff('day', cohort_day, day) AS offset_days,
        |   count(DISTINCT p.user_id) AS n_buyers,
        |   CAST(sum(cents) AS BIGINT) AS revenue_c
        | FROM purchases p JOIN cohort c ON p.user_id = c.user_id
        | WHERE day >= cohort_day
        | GROUP BY cohort_day, offset_days)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        | CAST(offset_days AS INTEGER) AS offset_days, n_buyers, revenue_c,
        | CAST(sum(revenue_c) OVER (PARTITION BY cohort_day ORDER BY offset_days)
        |      AS BIGINT) AS cum_revenue_c
        |FROM daily
        |ORDER BY cohort_day, offset_days""".stripMargin,
    "q_source_vocab_overlap" ->
      """WITH ts AS (
        | SELECT DISTINCT source, unnest(string_split(trim(text), ' ')) AS token
        | FROM documents),
        |vocab AS (SELECT source, count(*) AS v FROM ts GROUP BY source),
        |inter AS (
        | SELECT a.source AS s1, b.source AS s2, count(*) AS n_inter
        | FROM ts a JOIN ts b ON a.token = b.token AND a.source < b.source
        | GROUP BY s1, s2)
        |SELECT s1, s2, n_inter, v1.v AS v1, v2.v AS v2,
        | round(CAST(n_inter AS DOUBLE) / (v1.v + v2.v - n_inter), 6) AS jaccard
        |FROM inter
        |JOIN vocab v1 ON s1 = v1.source
        |JOIN vocab v2 ON s2 = v2.source
        |ORDER BY jaccard DESC, s1, s2
        |LIMIT 20""".stripMargin,
  )
}
