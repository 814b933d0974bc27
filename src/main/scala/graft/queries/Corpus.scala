package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.similarity.Similarity
import graft.text.TextFunctions._

/** Corpus-composition and governance operators — the decisions a
  * training-data pipeline makes AFTER cleaning/dedup: how much of each
  * source to sample, which embedding rows are distributional outliers,
  * how fast the vocabulary saturates, whether a release is re-identifiable,
  * and a portable content fingerprint for cross-system reconciliation.
  *
  * Every query is DuckDB-oracle-paired. Float discipline follows the
  * repo convention: sequential-order dot products ([[Similarity.dot]]),
  * aggregates rounded on BOTH sides before any threshold compare, and
  * integer arithmetic wherever the semantics allow (temperature weights
  * use floor(sqrt(n)) — IEEE sqrt is correctly rounded, so the integer
  * weight is bit-identical cross-engine, and everything after it is
  * exact integer math).
  */
object Corpus {
  type Q = (SparkSession, String) => DataFrame

  /** Temperature-scaled source mixing (the UniMax/multilingual-sampling
    * pattern, α = 0.5): per-source token counts → weight n^α → integer
    * share of a 10k-token budget. Up-weights small sources relative to
    * proportional sampling without letting any source dominate.
    *
    * 100 TB shape: ONE hash-agg shuffle keyed by source (map-side
    * combined); the weight/allocation math runs on the per-source
    * aggregate — O(#sources) rows — via a 1×1 broadcast of the weight
    * total. Integer end-to-end after floor(sqrt(·)): no float drift. */
  val qTemperatureMix: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens"))
    val w = cnt.withColumn("w", floor(sqrt(col("n_tokens"))).cast("long"))
    val tot = w.agg(sum("w").as("total_w"))
    w.crossJoin(tot) // 1-row aggregate broadcast, same pattern as Quality
      .withColumn("target_tokens", expr("CAST((10000 * w) div total_w AS BIGINT)"))
      .select("source", "n_tokens", "w", "target_tokens")
      .orderBy("source")
  }

  /** k-anonymity audit over the quasi-identifier pair (nation, market
    * segment): group size k per combination and an at-risk flag (k < 5 —
    * the classic re-identification bound). The release-gate check run
    * before publishing any user-derived training table.
    *
    * 100 TB shape: one hash-agg on the quasi-identifier tuple; output is
    * the QI-combination space, not the row count. */
  val qKanon: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("k"))
      .withColumn("at_risk", (col("k") < 5).cast("long"))
      .orderBy("nationkey", "mktsegment")

  /** Embedding outliers: cosine distance of each vector to its label
    * centroid, z-scored within the label; rows with z > 2 flagged — the
    * "mislabeled or off-distribution embedding" sweep run before using
    * labels for supervised filtering.
    *
    * 100 TB shape: centroids via ONE (label, dim)-keyed hash-agg over the
    * exploded vectors (map-side partial avg — never a per-label
    * collect), rebuilt into arrays and BROADCAST back (labels × dim is
    * driver-sized by construction); distances are a narrow per-row
    * expression; the per-label moment agg is again map-side combined.
    * Float discipline: cosine rounded 6dp, moments rounded 4dp on both
    * engines BEFORE the z threshold, so the flag is a pure function of
    * identically-rounded operands. */
  val qEmbedOutliers: Q = (s, d) => {
    val v = Similarity.prepared(Tables.embeddings(s, d))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("emb"), col("nrm"))
    val cent = v.select(col("label"), posexplode(col("emb")).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg("x").as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("cm"))
      .select(col("label"), expr("transform(cm, p -> p.m)").as("cvec"))
    val centN = cent.withColumn("cnrm", Similarity.l2norm(col("cvec")))
    val dist = v.join(broadcast(centN), "label")
      .withColumn("cos",
        round(Similarity.dot(col("emb"), col("cvec")) / (col("nrm") * col("cnrm")), 6))
      .withColumn("dist", round(lit(1.0) - col("cos"), 6))
    val st = dist.groupBy("label").agg(
      round(avg("dist"), 4).as("mu"),
      round(stddev_samp("dist"), 4).as("sigma"))
    dist.join(broadcast(st), "label")
      .withColumn("z", round((col("dist") - col("mu")) / col("sigma"), 4))
      .filter(col("z") > 2.0)
      .select("vec_id", "label", "dist", "z")
      .orderBy("vec_id")
  }

  /** Vocabulary growth (the Heaps'-law curve): distinct tokens whose FIRST
    * corpus appearance falls in each DOUBLING window of doc positions
    * (bucket b covers docs [2^b - 1, 2^(b+1) - 1)), plus the running
    * vocabulary size. Shows where a corpus stops contributing new types —
    * the saturation signal behind dedup/mixing decisions. Growth curves
    * are read on log axes anyway, and log buckets keep the curve length
    * at ~log2(corpus) whatever the scale.
    *
    * 100 TB shape: the heavy agg is token-keyed min(doc_id) (map-side
    * combined over the exploded corpus); the window runs over the BUCKET
    * series — ≤ ~40 doubling windows even at 10^12 docs — so the
    * unpartitioned window is driver-trivial by construction. The bucket
    * is floor(log2(doc+1)) computed as binary-digit count (integer-exact
    * in both engines; libm log2 is NOT correctly rounded at boundaries). */
  val qVocabGrowth: Q = (s, d) => {
    val first = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(min("doc_id").as("first_doc"))
    first.groupBy((length(bin(col("first_doc") + 1)) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
      .withColumn("cum_vocab", sum("new_tokens").over(Window.orderBy("bucket")))
      .orderBy("bucket")
  }

  /** Portable normalized-content fingerprint census: md5 over
    * whitespace-collapsed, case-folded text, counted distinct per source.
    * The cheap cross-system reconciliation check ("did the export drop or
    * duplicate content?") — md5 is identical in every engine, unlike
    * xxhash64, so the fingerprint itself travels across systems.
    *
    * 100 TB shape: fingerprints are a per-row expression; the census
    * shuffles 16-byte digests (map-side partial count-distinct), never
    * text. */
  val qNormFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct("fp").as("n_distinct"))
      .orderBy("source")

  val all: Map[String, Q] = Map(
    "q_temperature_mix" -> qTemperatureMix,
    "q_kanon" -> qKanon,
    "q_embed_outliers" -> qEmbedOutliers,
    "q_vocab_growth" -> qVocabGrowth,
    "q_norm_fingerprint" -> qNormFingerprint,
  )

  val oracles: Map[String, String] = Map(
    "q_temperature_mix" ->
      """WITH cnt AS (
        | SELECT source, CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY source),
        |w AS (SELECT source, n_tokens, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS w FROM cnt),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS total_w FROM w)
        |SELECT source, n_tokens, w, CAST((10000 * w) // total_w AS BIGINT) AS target_tokens
        |FROM w, t ORDER BY source""".stripMargin,
    "q_kanon" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS mktsegment,
        | count(*) AS k, CAST(count(*) < 5 AS BIGINT) AS at_risk
        |FROM customer GROUP BY 1, 2 ORDER BY nationkey, mktsegment""".stripMargin,
    "q_embed_outliers" ->
      """WITH v AS (
        | SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  list_transform(embedding, x -> x::DOUBLE) AS emb
        | FROM embeddings),
        |vn AS (SELECT vec_id, label, emb,
        |        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM v),
        |e AS (SELECT label, u.i AS dim, emb[u.i + 1] AS x
        |      FROM vn, unnest(range(0, len(emb))) AS u(i)),
        |c AS (SELECT label, dim, avg(x) AS m FROM e GROUP BY 1, 2),
        |cv AS (SELECT label, list(m ORDER BY dim) AS cvec FROM c GROUP BY label),
        |cn AS (SELECT label, cvec,
        |        sqrt(list_sum(list_transform(cvec, x -> x * x))) AS cnrm FROM cv),
        |dd AS (SELECT vec_id, vn.label AS label,
        |        round(1.0 - round(list_sum(list_transform(range(1, len(emb) + 1),
        |          i -> emb[i] * cvec[i])) / (nrm * cnrm), 6), 6) AS dist
        |       FROM vn JOIN cn ON vn.label = cn.label),
        |st AS (SELECT label, round(avg(dist), 4) AS mu,
        |        round(stddev_samp(dist), 4) AS sigma FROM dd GROUP BY label)
        |SELECT vec_id, dd.label AS label, dist, round((dist - mu) / sigma, 4) AS z
        |FROM dd JOIN st ON dd.label = st.label
        |WHERE round((dist - mu) / sigma, 4) > 2.0
        |ORDER BY vec_id""".stripMargin,
    "q_vocab_growth" ->
      """WITH first AS (
        | SELECT token, min(doc_id) AS first_doc FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents)
        | GROUP BY token),
        |b AS (SELECT CAST(length(bin(first_doc + 1)) - 1 AS BIGINT) AS bucket,
        |       count(*) AS new_tokens
        |      FROM first GROUP BY 1)
        |SELECT bucket, new_tokens,
        | CAST(sum(new_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_vocab
        |FROM b ORDER BY bucket""".stripMargin,
    "q_norm_fingerprint" ->
      """SELECT source, count(*) AS n_docs,
        | count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}
