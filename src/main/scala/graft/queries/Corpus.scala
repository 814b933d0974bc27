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

  /** Integer 16-bit min-max normalization, overflow-free for ANY long
    * range: first compress by `step = range div 2^16 + 1` (so the
    * compressed value fits 16 bits), then stretch the compressed range
    * back up to [0, 65535]. Monotone, pure integer — identical in Spark
    * SQL and DuckDB. Interleaving UNnormalized keys would let the
    * larger-ranged key own all the high z bits and the curve degrades to
    * a plain sort on it (measured: partkey spans stayed ~80% of global
    * before normalization). */
  private def scale16(k: String, mn: String, mx: String): String = {
    val step = s"(($mx - $mn) div 65536 + 1)"
    s"(((($k - $mn) div $step) * 65535) div ((($mx - $mn) div $step) + 1))"
  }

  /** Z-order clustering effectiveness report: min-max-normalize
    * (l_orderkey, l_partkey) to 16 bits each, Morton-interleave via the
    * codegen'd [[graft.functions.ZOrder2]] expression, cut the 32-bit z
    * space into its 32 top-level slices (what a z-sorted layout's files
    * would contain — [[graft.operators.Layout.zorderLayout]] is the
    * write-side operator), and report each slice's span on BOTH keys.
    * Narrow spans on both = scans filtering either key prune most files
    * on parquet footer stats. Pure integer math end to end —
    * bit-identical cross-engine.
    *
    * 100 TB shape: key bounds are one columnar-stats-cheap agg broadcast
    * back as a single row; z is a per-row codegen'd expression; the
    * report is one hash-agg on the 32-way slice id (z < 2^32 by
    * construction, so the slice is a constant shift — no max_z pass). */
  val qZorderLayout: Q = (s, d) => {
    val keys = Tables.lineitem(s, d)
      .select(col("l_orderkey").cast("long").as("ok"),
        col("l_partkey").cast("long").as("pk"))
    val bounds = keys.agg(
      min("ok").as("mn_ok"), max("ok").as("mx_ok"),
      min("pk").as("mn_pk"), max("pk").as("mx_pk"))
    keys.crossJoin(bounds) // 1-row aggregate broadcast
      .withColumn("z", graft.functions.ZOrder2.zorder2(
        expr(scale16("ok", "mn_ok", "mx_ok")),
        expr(scale16("pk", "mn_pk", "mx_pk"))))
      .withColumn("bucket", expr("z div 134217728")) // 2^32 / 32 slices
      .groupBy("bucket").agg(
        count(lit(1)).as("n_rows"),
        min("ok").as("min_orderkey"), max("ok").as("max_orderkey"),
        min("pk").as("min_partkey"), max("pk").as("max_partkey"))
      .orderBy("bucket")
  }

  /** Per-source distribution shift: KL divergence (nats) of each source's
    * token unigram distribution from the corpus-wide distribution — the
    * "which source is unlike the rest" score driving mixing and
    * quality-review priorities.
    *
    * 100 TB shape: two token-keyed hash-aggs (per-source and global, both
    * map-side combined) joined on token, then a per-source sum; the join
    * carries one row per (source, distinct token), not per occurrence.
    * Float discipline matches q_token_entropy: ln() terms summed then
    * rounded 4dp on both engines. */
  val qSourceDivergence: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
    val st = toks.groupBy("source", "t").agg(count(lit(1)).as("c"))
    val stot = st.groupBy("source").agg(sum("c").as("ns"))
    val glob = toks.groupBy("t").agg(count(lit(1)).as("g"))
    val gtot = glob.agg(sum("g").as("n"))
    st.join(stot, "source").join(glob, "t").crossJoin(gtot)
      .withColumn("term", (col("c") / col("ns")) *
        log((col("c") / col("ns")) / (col("g") / col("n"))))
      .groupBy("source")
      .agg(max("ns").as("n_tokens"), round(sum("term"), 4).as("kl_nats"))
      .orderBy("source")
  }

  /** BM25 ranked retrieval (Robertson/Okapi, k1=1.2 b=0.75, Lucene's
    * +1-inside-the-log idf) for a fixed conjunctive-ish query — the
    * lexical half of corpus search, complementing the ANN layer's vector
    * half. Top-20 docs by summed term score.
    *
    * 100 TB shape: the per-term filter runs BEFORE any shuffle (literal
    * isin on the exploded scan), so only query-term occurrences ever
    * leave a task; df/N/avgdl are O(#terms)+1-row broadcasts; ranking is
    * TakeOrderedAndProject, never a global sort. Scores rounded 4dp on
    * both engines before the rank (ties broken by doc_id). */
  val qBm25Search: Q = (s, d) => {
    val terms = Seq("spark", "query", "table")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("dl").as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy("doc_id", "dl", "t").agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "t").crossJoin(stats)
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("score", col("idf") * col("tf") * (lit(1.2) + 1.0) /
        (col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("score"), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(20)
  }

  /** l-diversity companion to [[qKanon]]: within each quasi-identifier
    * group, how many DISTINCT sensitive values (account-balance bands in
    * integer cents — k-anonymity without l-diversity still leaks when a
    * whole group shares one sensitive value). Flags k < 5 or l < 2.
    *
    * 100 TB shape: one hash-agg on (QI, band) then one on QI — both
    * map-side combined; integer banding (cents div 100000) is exact. */
  val qLDiversity: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("band"))
      .groupBy("nationkey", "mktsegment")
      .agg(count(lit(1)).as("k"), countDistinct("band").as("l"),
        (count(lit(1)) < 5 || countDistinct("band") < 2).cast("long").as("at_risk"))
      .orderBy("nationkey", "mktsegment")

  /** Chi-square independence scan: is the event-type mix stable across
    * weekdays? Per-(type, isodow) observed vs expected-under-independence
    * counts, aggregated to a per-type statistic (summing them gives the
    * table's chi2; dof = (types-1)(7-1)). A drifting cell means the
    * event mix depends on the day — the seasonality check run before
    * treating any daily sample as representative.
    *
    * 100 TB shape: one (type, dow)-keyed hash-agg; margins are tiny
    * broadcasts; the statistic is computed on the contingency table —
    * O(types × 7) rows — not the event stream. */
  val qChiSquare: Q = (s, d) => {
    val obs = Tables.events(s, d)
      .select(col("event_type"), (weekday(col("ts")) + 1).cast("long").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).cast("double").as("o"))
    val rowM = obs.groupBy("event_type").agg(sum("o").as("rm"))
    val colM = obs.groupBy("dow").agg(sum("o").as("cm"))
    val tot = obs.agg(sum("o").as("n"))
    obs.join(broadcast(rowM), "event_type").join(broadcast(colM), "dow")
      .crossJoin(tot)
      .withColumn("e", col("rm") * col("cm") / col("n"))
      .withColumn("contrib", (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
      .groupBy("event_type")
      .agg(sum("o").cast("long").as("n_events"),
        round(sum("contrib"), 4).as("chi2_contrib"))
      .orderBy("event_type")
  }

  /** Categorical mutual information I(lang; source) in nats, reported as
    * per-lang partial sums (their total is the table MI). Near-zero MI =
    * language is independent of source; high MI = sources are
    * language-siloed — which changes how language-balanced sampling must
    * stratify.
    *
    * 100 TB shape: identical to [[qChiSquare]] — the statistic lives on
    * the (lang × source) contingency table, never the corpus. */
  val qMutualInfo: Q = (s, d) => {
    val obs = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).cast("double").as("o"))
    val rowM = obs.groupBy("lang").agg(sum("o").as("rm"))
    val colM = obs.groupBy("source").agg(sum("o").as("cm"))
    val tot = obs.agg(sum("o").as("n"))
    obs.join(broadcast(rowM), "lang").join(broadcast(colM), "source")
      .crossJoin(tot)
      .withColumn("term",
        (col("o") / col("n")) * log(col("o") * col("n") / (col("rm") * col("cm"))))
      .groupBy("lang")
      .agg(sum("o").cast("long").as("n_docs"), round(sum("term"), 4).as("mi_contrib"))
      .orderBy("lang")
  }

  /** Window-free per-group argmax: richest customer per nation via two
    * hash-aggs and a broadcast join (max value per group → tie-break on
    * min key among the maxima) instead of a rank() window. On a 100 TB
    * fact table the window form sorts EVERY group's rows; this form
    * shuffles one row per group twice and never sorts — the idiom to
    * reach for when only the argmax survives. */
  val qArgmax: Q = (s, d) => {
    val c = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_custkey").as("custkey"), col("c_acctbal").as("acctbal"))
    val mx = c.groupBy("nationkey")
      .agg(max("acctbal").as("best_acctbal"))
      .withColumnRenamed("nationkey", "mx_nationkey")
    c.join(broadcast(mx), col("nationkey") === col("mx_nationkey") &&
        col("acctbal") === col("best_acctbal"))
      .groupBy("nationkey", "best_acctbal")
      .agg(min("custkey").as("best_custkey"))
      .select("nationkey", "best_custkey", "best_acctbal")
      .orderBy("nationkey")
  }

  /** Curriculum deciles: documents cut into 10 length bands per language
    * (ntile over a FULLY deterministic order — n_chars then doc_id), with
    * per-band counts and bounds. The banding behind length-staged
    * training curricula and per-band quality review.
    *
    * 100 TB shape: the window partitions by lang — parallel across
    * languages; within one language ntile is a sort, the honest cost of
    * exact deciles (the approx-percentile path is the sort-free
    * alternative, q_percentiles). */
  val qCurriculum: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("lang", "decile")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("lang", "decile")
  }

  /** Distinctive-keyword extraction per source: top-5 terms by
    * pointwise lift (P(t|source) / P(t) in integer milli — all four
    * factors are exact BIGINT counts, so the floor-div quotient is
    * bit-identical cross-engine), tf-desc/term-asc tie-broken. The
    * label a catalog shows next to each corpus slice.
    *
    * 100 TB shape: the fact-sized work is the one (source, term)
    * count shuffle; lift and ranking run on the |sources|·|vocab|
    * aggregate with the global term counts joined by term key (they
    * are vocab-sized, broadcast in practice). Count products stay
    * under int64 to ~10¹⁸ token-pairs; beyond that, rescale the milli
    * factor before the multiply. */
  val qKeywordLift: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
    val st = toks.groupBy("source", "t").agg(count(lit(1)).as("c"))
    val stot = st.groupBy("source").agg(sum("c").as("ns"))
    val glob = toks.groupBy("t").agg(count(lit(1)).as("g"))
    val gtot = glob.agg(sum("g").as("n"))
    val w = Window.partitionBy("source")
      .orderBy(desc("lift_milli"), desc("c"), asc("t"))
    st.join(stot, "source").join(glob, "t").crossJoin(gtot)
      .withColumn("lift_milli", expr("(c * n * 1000) div (ns * g)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("t").as("term"), col("c").as("tf"),
        col("lift_milli"), col("rn"))
      .orderBy("source", "rn")
  }

  val all: Map[String, Q] = Map(
    "q_keyword_lift" -> qKeywordLift,
    "q_argmax" -> qArgmax,
    "q_curriculum" -> qCurriculum,
    "q_chi_square" -> qChiSquare,
    "q_mutual_info" -> qMutualInfo,
    "q_bm25_search" -> qBm25Search,
    "q_ldiversity" -> qLDiversity,
    "q_temperature_mix" -> qTemperatureMix,
    "q_kanon" -> qKanon,
    "q_embed_outliers" -> qEmbedOutliers,
    "q_vocab_growth" -> qVocabGrowth,
    "q_norm_fingerprint" -> qNormFingerprint,
    "q_zorder_layout" -> qZorderLayout,
    "q_source_divergence" -> qSourceDivergence,
  )

  val oracles: Map[String, String] = Map(
    "q_keyword_lift" ->
      """WITH toks AS (
        | SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
        | FROM documents),
        |st AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2),
        |stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM st GROUP BY 1),
        |gc AS (SELECT t, count(*) AS g FROM toks GROUP BY 1),
        |gtot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gc),
        |lifted AS (
        | SELECT source, t, c, (c * n * 1000) // (ns * g) AS lift_milli
        | FROM st JOIN stot USING (source) JOIN gc USING (t), gtot),
        |ranked AS (
        | SELECT source, t, c, lift_milli,
        |  CAST(row_number() OVER (PARTITION BY source
        |   ORDER BY lift_milli DESC, c DESC, t) AS INTEGER) AS rn
        | FROM lifted)
        |SELECT source, t AS term, c AS tf, lift_milli, rn
        |FROM ranked WHERE rn <= 5 ORDER BY source, rn""".stripMargin,
    "q_argmax" ->
      """WITH mx AS (
        | SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  max(c_acctbal) AS best_acctbal
        | FROM customer GROUP BY 1)
        |SELECT nationkey, min(c_custkey) AS best_custkey, best_acctbal
        |FROM customer JOIN mx
        |  ON CAST(c_nationkey AS BIGINT) = nationkey AND c_acctbal = best_acctbal
        |GROUP BY nationkey, best_acctbal ORDER BY nationkey""".stripMargin,
    "q_curriculum" ->
      """WITH t AS (
        | SELECT lang, doc_id, n_chars,
        |  CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |    AS BIGINT) AS decile
        | FROM documents)
        |SELECT lang, decile, count(*) AS n_docs,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM t GROUP BY 1, 2 ORDER BY lang, decile""".stripMargin,
    "q_chi_square" ->
      """WITH obs AS (
        | SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
        |  CAST(count(*) AS DOUBLE) AS o
        | FROM events GROUP BY 1, 2),
        |rm AS (SELECT event_type, sum(o) AS rm FROM obs GROUP BY 1),
        |cm AS (SELECT dow, sum(o) AS cm FROM obs GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM obs)
        |SELECT event_type, CAST(sum(o) AS BIGINT) AS n_events,
        | round(sum((o - rm * cm / n) * (o - rm * cm / n) / (rm * cm / n)), 4)
        |   AS chi2_contrib
        |FROM obs JOIN rm USING (event_type) JOIN cm USING (dow), tot
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_mutual_info" ->
      """WITH obs AS (
        | SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
        | FROM documents GROUP BY 1, 2),
        |rm AS (SELECT lang, sum(o) AS rm FROM obs GROUP BY 1),
        |cm AS (SELECT source, sum(o) AS cm FROM obs GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM obs)
        |SELECT lang, CAST(sum(o) AS BIGINT) AS n_docs,
        | round(sum((o / n) * ln(o * n / (rm * cm))), 4) AS mi_contrib
        |FROM obs JOIN rm USING (lang) JOIN cm USING (source), tot
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_bm25_search" ->
      """WITH docs AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        | FROM documents),
        |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM docs),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |           avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf FROM (
        |  SELECT doc_id, dl, unnest(toks) AS t FROM dl)
        | WHERE t IN ('spark', 'query', 'table') GROUP BY 1, 2, 3),
        |df AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
        |sc AS (SELECT doc_id,
        |  ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * (1.2 + 1.0) /
        |    (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS score
        | FROM tf JOIN df USING (t), stats)
        |SELECT doc_id, round(sum(score), 4) AS bm25, count(*) AS n_terms_hit
        |FROM sc GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_ldiversity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS mktsegment,
        | count(*) AS k,
        | count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) // 100000) AS l,
        | CAST((count(*) < 5 OR
        |   count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) // 100000) < 2)
        |  AS BIGINT) AS at_risk
        |FROM customer GROUP BY 1, 2 ORDER BY nationkey, mktsegment""".stripMargin,
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
    // 16-bit integer min-max normalization (compress-then-stretch, same
    // formula as scale16) + the 5-step mask-and-spread Morton interleave,
    // staged as CTEs; all masks in decimal — integer-exact
    "q_zorder_layout" ->
      """WITH k0 AS (
        | SELECT CAST(l_orderkey AS BIGINT) AS ok0, CAST(l_partkey AS BIGINT) AS pk0
        | FROM lineitem),
        |bnd AS (SELECT min(ok0) AS mn_ok, max(ok0) AS mx_ok,
        |         min(pk0) AS mn_pk, max(pk0) AS mx_pk FROM k0),
        |k AS (SELECT ok0, pk0,
        |  (((ok0 - mn_ok) // ((mx_ok - mn_ok) // 65536 + 1)) * 65535)
        |    // (((mx_ok - mn_ok) // ((mx_ok - mn_ok) // 65536 + 1)) + 1) AS a,
        |  (((pk0 - mn_pk) // ((mx_pk - mn_pk) // 65536 + 1)) * 65535)
        |    // (((mx_pk - mn_pk) // ((mx_pk - mn_pk) // 65536 + 1)) + 1) AS b
        | FROM k0, bnd),
        |s1 AS (SELECT ok0, pk0,
        |        (a | (a << 16)) & 281470681808895 AS a,
        |        (b | (b << 16)) & 281470681808895 AS b FROM k),
        |s2 AS (SELECT ok0, pk0,
        |        (a | (a << 8)) & 71777214294589695 AS a,
        |        (b | (b << 8)) & 71777214294589695 AS b FROM s1),
        |s3 AS (SELECT ok0, pk0,
        |        (a | (a << 4)) & 1085102592571150095 AS a,
        |        (b | (b << 4)) & 1085102592571150095 AS b FROM s2),
        |s4 AS (SELECT ok0, pk0,
        |        (a | (a << 2)) & 3689348814741910323 AS a,
        |        (b | (b << 2)) & 3689348814741910323 AS b FROM s3),
        |s5 AS (SELECT ok0, pk0,
        |        (a | (a << 1)) & 6148914691236517205 AS a,
        |        (b | (b << 1)) & 6148914691236517205 AS b FROM s4),
        |z AS (SELECT ok0, pk0, a | (b << 1) AS z FROM s5)
        |SELECT z // 134217728 AS bucket, count(*) AS n_rows,
        | min(ok0) AS min_orderkey, max(ok0) AS max_orderkey,
        | min(pk0) AS min_partkey, max(pk0) AS max_partkey
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_source_divergence" ->
      """WITH toks AS (
        | SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
        | FROM documents),
        |st AS (SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2),
        |stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM st GROUP BY 1),
        |gc AS (SELECT t, count(*) AS g FROM toks GROUP BY 1),
        |gtot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gc)
        |SELECT source, max(ns) AS n_tokens,
        | round(sum((c / CAST(ns AS DOUBLE)) *
        |   ln((c / CAST(ns AS DOUBLE)) / (g / CAST(n AS DOUBLE)))), 4) AS kl_nats
        |FROM st JOIN stot USING (source) JOIN gc USING (t), gtot
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
