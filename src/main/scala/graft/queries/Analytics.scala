package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** r7b analytics batch — cross-domain operators a curation/BI stack
  * reaches for next: Pareto-frontier selection (skyline), directional
  * containment dedup, first-occurrence n-gram novelty, multi-touch
  * purchase attribution, PCA structure reporting, farthest-first
  * coresets, content-defined chunking, leakage-free temporal splits,
  * deflate-compressibility profiling, and the per-source dataset card.
  * DuckDB-oracle-paired wherever SQL can express the semantics (all but
  * the eigensolve, the float-argmax coreset, and the compressor); float
  * discipline follows the repo convention (integer thresholds, integer
  * credit units, integer cents wherever a comparison or a sum could
  * drift — rounding only on final reported values).
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  /** Per-brand Pareto frontier (skyline) of parts on (minimize price,
    * maximize size): a part survives iff no same-brand part is cheaper
    * with at-least-equal size, or equal-priced with strictly larger size.
    *
    * The naive skyline is an O(n²) dominance self-join; this is the
    * sort-based O(n log n) staircase instead: order each brand by price
    * and compare every row's size against (1) the max size over all
    * STRICTLY cheaper rows (RANGE … 1 PRECEDING — exact because the key
    * is integer cents) and (2) the max size among its price ties (RANGE
    * CURRENT ROW spans peers). Both are one window pass.
    *
    * 100 TB shape: the window partitions by brand — embarrassingly
    * parallel across brands, spillable external sort within one; no
    * self-join, no cross product. Price in integer cents so the RANGE
    * frame bound and every comparison are exact cross-engine. */
  val qSkyline: Q = (s, d) => {
    val p = Tables.part(s, d).select(
      col("p_brand").as("brand"), col("p_partkey").cast("long").as("partkey"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_c"),
      col("p_size").cast("long").as("size"))
    val byPrice = Window.partitionBy("brand").orderBy("price_c")
    val cheaper = byPrice.rangeBetween(Window.unboundedPreceding, -1)
    val peers = byPrice.rangeBetween(Window.currentRow, Window.currentRow)
    p.withColumn("m_cheaper", max("size").over(cheaper))
      .withColumn("m_same", max("size").over(peers))
      .filter((col("m_cheaper").isNull || col("m_cheaper") < col("size")) &&
        col("m_same") === col("size"))
      .select("brand", "partkey", "price_c", "size")
      .orderBy("brand", "price_c", "partkey")
  }

  /** Directional containment near-dup: (a, b) pairs where ≥ 4/5 of a's
    * word-trigram shingles also occur in b — catches the short-doc-
    * quoted-inside-long-doc duplication Jaccard's union denominator
    * hides. Inverted-index join via [[Dedup.containmentPairs]]; the 4/5
    * threshold is compared in integers (5·common ≥ 4·na), never floats. */
  val qContainment: Q = (s, d) =>
    Dedup.containmentPairs(Tables.documents(s, d), num = 4, den = 5)
      .orderBy("a_id", "b_id")

  /** First-occurrence n-gram novelty per source: the fraction of each
    * doc's shingles whose FIRST corpus appearance (min doc_id over the
    * whole corpus) is that doc itself, averaged per source — the
    * "marginal new content" signal behind source-level dedup and mixing
    * budgets (a source whose docs are mostly re-statements of earlier
    * shingles adds little).
    *
    * 100 TB shape: one shingle-keyed hash-agg for the global first-doc
    * map (map-side combined), one join back on the shingle, then
    * doc- and source-level aggs. The join carries (doc, distinct shingle)
    * rows — never per-occurrence. Novelty averaged from exact integer
    * counts and rounded 4dp on both engines. */
  val qNgramNovelty: Q = (s, d) => {
    val sh = Dedup.shingled(Tables.documents(s, d))
      .select(col("doc_id"), col("nsh"), explode(col("sh")).as("shingle"))
    val first = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    val perDoc = sh.join(first, "shingle")
      .groupBy("doc_id", "nsh")
      .agg(sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
    Tables.documents(s, d).select("doc_id", "source").join(perDoc, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_novel").cast("double") / col("nsh")), 4).as("avg_novelty"))
      .orderBy("source")
  }

  /** Linear multi-touch attribution: every purchase splits one unit of
    * credit equally across the user's click/view touches in the
    * preceding 24 h; untouched purchases credit a 'direct' bucket. The
    * standard marketing-channel report, here per touch type.
    *
    * Credit is computed in integer micro-units (1 000 000 div n per
    * touch) and summed as longs — IEEE summation order can flip a
    * 4dp-rounded float total between engines, an exact integer sum
    * cannot. The ≤ 0.000001 allocation remainder from the integer div is
    * a deterministic definition, not drift.
    *
    * 100 TB shape: purchases ⋈ touches is an equi-join on user_id with
    * the 24 h bound as a residual range predicate (the q_conversion_24h
    * shape — bounded by per-user activity, never a time cross product);
    * everything after is per-(purchase, channel) aggs, map-side
    * combined. */
  val qAttribution: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"))
    val touch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("channel"),
        unix_micros(col("ts")).as("t_us"))
    val hits = purch.join(touch, Seq("user_id"))
      .filter(col("t_us") <= col("p_us") &&
        col("p_us") - col("t_us") < lit(86400000000L))
    val cnt = hits.groupBy("p_id", "channel").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("p_id").agg(sum("c").as("n"))
    val attributed = cnt.join(tot, "p_id")
      .withColumn("cr", col("c") * expr("1000000 div n"))
      .groupBy("channel")
      .agg(round(sum("cr") / 1e6, 4).as("credit"),
        countDistinct("p_id").as("n_purchases"))
    val touched = tot.select(col("p_id").as("t_p_id"))
    val direct = purch.join(touched, col("p_id") === col("t_p_id"), "left_anti")
      .agg(count(lit(1)).as("n_direct"))
      .select(lit("direct").as("channel"),
        round(col("n_direct").cast("double"), 4).as("credit"),
        col("n_direct").as("n_purchases"))
    attributed.unionByName(direct).orderBy("channel")
  }

  /** Embeddings with the canonical double-vector column. */
  private def embDouble(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      col("label").cast("long").as("label"),
      expr("transform(embedding, x -> cast(x as double))").as("emb"))

  /** PCA structure report: fit top-2 principal components
    * ([[graft.ml.Pca]] — one-pass distributed sufficient statistics,
    * driver-sized Jacobi eigensolve), project every embedding, report
    * per-label moments of the projected coordinates plus the global
    * explained-variance ratios. The "is the label structure visible in
    * 2 linear dims" diagnostic run before trusting labels downstream.
    *
    * Rows-only: an eigendecomposition is not ANSI-SQL-expressible; the
    * fit itself is pinned by PcaSpec (residual ‖Cv−λv‖, orthonormality,
    * projected-variance ≡ eigenvalue, determinism). */
  val qPcaProject: Q = (s, d) => {
    val v = embDouble(s, d)
    val dim = v.select(size(col("emb"))).limit(1).collect().head.getInt(0)
    val fit = graft.ml.Pca.fit(v, dim, k = 2)
    val evr = fit.eigenvalues.map(e => math.rint(e / fit.totalVar * 10000) / 10000)
    v.withColumn("pc1", graft.ml.Pca.projection(col("emb"), fit.components(0)))
      .withColumn("pc2", graft.ml.Pca.projection(col("emb"), fit.components(1)))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("pc1"), 4).as("mean_pc1"), round(stddev_samp("pc1"), 4).as("sd_pc1"),
        round(avg("pc2"), 4).as("mean_pc2"), round(stddev_samp("pc2"), 4).as("sd_pc2"))
      .withColumn("evr1", lit(evr(0))).withColumn("evr2", lit(evr(1)))
      .orderBy("label")
  }

  /** Portable-PCA certificate (r15, VERDICT r14 task 5 — the
    * q_phash_portable pattern): the IDENTICAL [[graft.ml.Pca]] code
    * path — one-pass distributed sufficient statistics, 30-sweep
    * cyclic-Jacobi driver eigensolve, sign-fixed top-2 components,
    * 0.0-seeded left-fold projection — held to a FULL arithmetic
    * DuckDB oracle at d = 4 over integer-quantized features
    * (floor(emb·1000)). Why this is ulp-safe where q_pca_project is
    * not: every sufficient-statistic sum is a sum of integer-valued
    * doubles — EXACT in IEEE while |Σ| < 2⁵³, so partition order
    * cannot perturb a bit — and everything downstream is a
    * deterministic float-op sequence the oracle replays op-for-op
    * (the Jacobi schedule as a 360-step recursive CTE = 30 sweeps ×
    * 6 pairs × 2 rotation phases, eigen sort by (λ desc, idx), the
    * largest-|entry| sign pivot, the left-fold dot). q_pca_project
    * itself (d = 64, float inputs) stays permanently adjudicated
    * rows-only: its statistic sums are genuinely order-dependent in
    * IEEE and its replay would be 121k CTE steps × 8k cells — see
    * PLANS.md r15. */
  val qPcaPortable: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
    val v4 = base.select(col("vec_id"), col("label").cast("long").as("label"),
      array((1 to 4).map(i =>
        floor(element_at(col("embedding"), i).cast("double") * lit(1000.0))
          .cast("double")): _*).as("emb"))
    val fit = graft.ml.Pca.fit(v4, 4, k = 2)
    v4.withColumn("pc1", graft.ml.Pca.projection(col("emb"), fit.components(0)))
      .withColumn("pc2", graft.ml.Pca.projection(col("emb"), fit.components(1)))
      .select(col("vec_id"), col("label"), col("pc1"), col("pc2"),
        lit(fit.eigenvalues(0)).as("eig1"), lit(fit.eigenvalues(1)).as("eig2"),
        lit(fit.totalVar).as("total_var"))
      .orderBy("vec_id")
  }

  /** Farthest-first k-center coreset (k = 8) over the embeddings
    * ([[graft.similarity.Coreset]]): the selection order, each pick's
    * vec_id, and the coverage radius the pick reduced. Full oracle
    * (r14, was rows-only): the greedy is replayed in DuckDB as a
    * recursive CTE over the packed embedding lists — the
    * q_mmr_diversify pattern — with the identical sequential-sum
    * distance, the identical (d² desc, id asc) argmax as a struct max,
    * and HALF_UP round-6 radii on both sides (Spark-side BigDecimal,
    * matching DuckDB's round(); `rint`'s half-even would diverge on
    * exact halves). The brute-force greedy referee and the
    * non-increasing-radii invariant stay spec-pinned. */
  val qCoreset: Q = (s, d) => {
    val picked = graft.similarity.Coreset.kCenter(embDouble(s, d), 8)
    import s.implicits._
    picked.zipWithIndex.map { case ((id, _, r), i) =>
      (i + 1L, id, if (r.isNaN) 0.0
        else BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("sel_idx", "vec_id", "radius").orderBy("sel_idx")
  }

  /** Content-defined chunking census ([[graft.text.Chunker]] — rolling
    * polynomial-hash boundaries, exact integer math): per-source chunk
    * counts, mean chunk length, and the chunk-level duplication ratio
    * (1 − distinct/total over md5 chunk fingerprints) — the CDC
    * prefilter view of cross-version redundancy that document-level
    * dedup can't see. Oracle replays the identical polynomial in SQL. */
  val qCdcChunks: Q = (s, d) => {
    val ch = graft.text.Chunker
      .withChunks(Tables.documents(s, d).select("doc_id", "source", "text"), "text")
      .select(col("doc_id"), col("source"), explode(col("chunks")).as("chunk"))
    ch.groupBy("source").agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_chunks"),
        round(avg(length(col("chunk"))), 4).as("avg_chunk_len"),
        countDistinct(md5(col("chunk"))).as("n_distinct_chunks"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_distinct_chunks").cast("double") / col("n_chunks"), 4))
      .orderBy("source")
  }

  /** Leakage-free temporal split: per user, the FIRST 80% of events (by
    * (ts, event_id) — a total order, so the cut is deterministic) go to
    * train, the rest to test — the split that respects causality for
    * sequence models, where a random split leaks future context into
    * training. Integer math: rn ≤ (4n div 5).
    *
    * 100 TB shape: one user-partitioned window (parallel across users,
    * spillable within one) + a per-user count broadcast-joined back via
    * a count(*) OVER the same partition — no second shuffle. */
  val qTemporalSplit: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cnt = Window.partitionBy("user_id")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cnt))
      .withColumn("split",
        when(col("rn") * 5 <= col("n") * 4, "train").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("total_value_c"))
      .orderBy("split")
  }

  /** Deflate-compressibility profile per source
    * ([[graft.text.Compressibility]]): mean/min/max compression ratio —
    * repetitive (templated/spammy) sources score low, noise-like ones
    * high. Rows-only: no SQL engine exposes a compressor; determinism
    * and the monotone repetitive-vs-random invariant are spec-pinned. */
  val qCompressRatio: Q = (s, d) =>
    graft.text.Compressibility.withRatio(Tables.documents(s, d))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("ratio"), 4).as("avg_ratio"),
        round(min("ratio"), 4).as("min_ratio"),
        round(max("ratio"), 4).as("max_ratio"))
      .orderBy("source")

  /** Dataset card: the per-source datasheet row a release ships with —
    * doc/token/language counts, exact-duplicate share, and the median
    * document length (lower median via
    * [[graft.operators.Percentiles.groupedMedianLow]] — a datum, so
    * bit-identical cross-engine). One scan feeds the token/lang/dup
    * aggs; the median adds the one sort order statistics honestly cost.
    */
  val qDatasetCard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val base = docs
      .withColumn("nt", size(tokens(col("text"))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"),
        countDistinct("lang").as("n_langs"))
    val dups = docs.groupBy("source", "text")
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum(col("c") - 1).as("n_dup_docs"))
    val med = graft.operators.Percentiles.groupedMedianLow(
      docs.select(col("source"), col("n_chars")), "source", "n_chars", "med_chars")
    base.join(dups, "source").join(med, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("n_dup_docs"), col("med_chars"))
      .orderBy("source")
  }

  /** Deterministic portable epoch shuffle: the data-ordering operator a
    * training pipeline needs for reproducible epochs — shard and
    * within-shard order derived ONLY from md5(doc_id:epoch), so any
    * engine (and any rerun, on any cluster layout) produces the
    * identical sequence. Shard = first two hex digits mod 8 (uniform);
    * within-shard rank over (hash, doc_id). The order_checksum
    * (Σ doc_id·rank, exact integer) certifies the full per-shard
    * SEQUENCE cross-engine, not just membership.
    *
    * 100 TB shape: shard assignment is a per-row expression; the rank
    * window partitions by shard — embarrassingly parallel, no global
    * order anywhere. */
  val qEpochShuffle: Q = (s, d) => {
    val h = md5(concat(col("doc_id").cast("string"), lit(":"), lit("1")))
    def hx(i: Int): Column =
      expr(s"instr('0123456789abcdef', substring(h, $i, 1)) - 1")
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables.documents(s, d).select(col("doc_id"))
      .withColumn("h", h)
      .withColumn("shard", pmod(hx(1) * 16 + hx(2), lit(8)).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id") * col("rn")).as("order_checksum"))
      .orderBy("shard")
  }

  /** Two-sample A/B test (Welch z) on purchase values, variant =
    * user_id parity: the experiment read-out an analytics engine ships —
    * per-variant n/mean, the z statistic, and the |z| > 1.96 call.
    * All moments flow from EXACT integer-cent sums (Σv, Σv² as longs) —
    * the double arithmetic after is the same expression tree in both
    * engines, so the 4dp-rounded statistic cannot drift. One conditional
    * aggregation pass, map-side combined. */
  val qAbTest: Q = (s, d) => {
    val p = Tables.events(s, d).filter(col("event_type") === "purchase")
      .withColumn("va", pmod(col("user_id"), lit(2)))
      .withColumn("vc", expr("CAST(round(value * 100) AS BIGINT)"))
    def side(v: Int, c: Column) = sum(when(col("va") === v, c).otherwise(lit(0L)))
    p.agg(
        side(0, lit(1L)).as("n_a"), side(1, lit(1L)).as("n_b"),
        side(0, col("vc")).as("s_a"), side(1, col("vc")).as("s_b"),
        side(0, col("vc") * col("vc")).as("ss_a"),
        side(1, col("vc") * col("vc")).as("ss_b"))
      .withColumn("mean_a", round(col("s_a") / col("n_a") / 100.0, 4))
      .withColumn("mean_b", round(col("s_b") / col("n_b") / 100.0, 4))
      // square in DOUBLE: (Σcents)² overflows int64 at sf0.1 scale
      .withColumn("var_a",
        (col("ss_a") - col("s_a").cast("double") * col("s_a") / col("n_a")) /
          (col("n_a") - 1) / 10000.0)
      .withColumn("var_b",
        (col("ss_b") - col("s_b").cast("double") * col("s_b") / col("n_b")) /
          (col("n_b") - 1) / 10000.0)
      .withColumn("z", round((col("s_a") / col("n_a") - col("s_b") / col("n_b")) / 100.0 /
        sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")), 4))
      .withColumn("significant", (abs(col("z")) > 1.96).cast("long"))
      .select("n_a", "n_b", "mean_a", "mean_b", "z", "significant")
  }

  val all: Map[String, Q] = Map(
    "q_epoch_shuffle" -> qEpochShuffle,
    "q_ab_test" -> qAbTest,
    "q_temporal_split" -> qTemporalSplit,
    "q_compress_ratio" -> qCompressRatio,
    "q_dataset_card" -> qDatasetCard,
    "q_skyline" -> qSkyline,
    "q_containment" -> qContainment,
    "q_ngram_novelty" -> qNgramNovelty,
    "q_attribution" -> qAttribution,
    "q_pca_project" -> qPcaProject,
    "q_pca_portable" -> qPcaPortable,
    "q_coreset" -> qCoreset,
    "q_cdc_chunks" -> qCdcChunks,
  )

  val oracles: Map[String, String] = Map(
    // r15 (VERDICT r14 task 5): full arithmetic replay of the d=4
    // Pca path — exact-integer sufficient statistics, the 30-sweep
    // cyclic-Jacobi rotation schedule unrolled as a 360-step recursive
    // CTE over the 32 (a, v) matrix cells (window functions fetch the
    // pivot row/column within one step; c,s carry phase 1 → phase 2),
    // then eigen sort, sign pivot and the 0.0-seeded left-fold
    // projection — every double bit-equal cross-engine.
    "q_pca_portable" ->
      """WITH RECURSIVE
        |feat AS (
        |  SELECT vec_id, label::BIGINT AS label,
        |    floor(embedding[1]::DOUBLE * 1000.0) AS e1,
        |    floor(embedding[2]::DOUBLE * 1000.0) AS e2,
        |    floor(embedding[3]::DOUBLE * 1000.0) AS e3,
        |    floor(embedding[4]::DOUBLE * 1000.0) AS e4
        |  FROM embeddings
        |),
        |stats AS (
        |  SELECT COUNT(*)::DOUBLE AS n,
        |    SUM(e1) AS s1, SUM(e2) AS s2, SUM(e3) AS s3, SUM(e4) AS s4,
        |    SUM(e1 * e1) AS s11,
        |    SUM(e1 * e2) AS s12,
        |    SUM(e1 * e3) AS s13,
        |    SUM(e1 * e4) AS s14,
        |    SUM(e2 * e1) AS s21,
        |    SUM(e2 * e2) AS s22,
        |    SUM(e2 * e3) AS s23,
        |    SUM(e2 * e4) AS s24,
        |    SUM(e3 * e1) AS s31,
        |    SUM(e3 * e2) AS s32,
        |    SUM(e3 * e3) AS s33,
        |    SUM(e3 * e4) AS s34,
        |    SUM(e4 * e1) AS s41,
        |    SUM(e4 * e2) AS s42,
        |    SUM(e4 * e3) AS s43,
        |    SUM(e4 * e4) AS s44
        |  FROM feat
        |),
        |covw AS (
        |  SELECT n,
        |    s11 / n - (s1 / n) * (s1 / n) AS c00,
        |    s12 / n - (s1 / n) * (s2 / n) AS c01,
        |    s13 / n - (s1 / n) * (s3 / n) AS c02,
        |    s14 / n - (s1 / n) * (s4 / n) AS c03,
        |    s21 / n - (s2 / n) * (s1 / n) AS c10,
        |    s22 / n - (s2 / n) * (s2 / n) AS c11,
        |    s23 / n - (s2 / n) * (s3 / n) AS c12,
        |    s24 / n - (s2 / n) * (s4 / n) AS c13,
        |    s31 / n - (s3 / n) * (s1 / n) AS c20,
        |    s32 / n - (s3 / n) * (s2 / n) AS c21,
        |    s33 / n - (s3 / n) * (s3 / n) AS c22,
        |    s34 / n - (s3 / n) * (s4 / n) AS c23,
        |    s41 / n - (s4 / n) * (s1 / n) AS c30,
        |    s42 / n - (s4 / n) * (s2 / n) AS c31,
        |    s43 / n - (s4 / n) * (s3 / n) AS c32,
        |    s44 / n - (s4 / n) * (s4 / n) AS c33
        |  FROM stats
        |),
        |cells AS (
        |  SELECT 'a' AS mat, t.i, t.j, CASE t.i * 4 + t.j WHEN 0 THEN c00 WHEN 1 THEN c01 WHEN 2 THEN c02 WHEN 3 THEN c03 WHEN 4 THEN c10 WHEN 5 THEN c11 WHEN 6 THEN c12 WHEN 7 THEN c13 WHEN 8 THEN c20 WHEN 9 THEN c21 WHEN 10 THEN c22 WHEN 11 THEN c23 WHEN 12 THEN c30 WHEN 13 THEN c31 WHEN 14 THEN c32 ELSE c33 END AS val
        |  FROM covw, (VALUES (0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (1, 1), (1, 2), (1, 3), (2, 0), (2, 1), (2, 2), (2, 3), (3, 0), (3, 1), (3, 2), (3, 3)) t(i, j)
        |  UNION ALL
        |  SELECT 'v', t.i, t.j, CASE WHEN t.i = t.j THEN 1.0 ELSE 0.0 END
        |  FROM (VALUES (0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (1, 1), (1, 2), (1, 3), (2, 0), (2, 1), (2, 2), (2, 3), (3, 0), (3, 1), (3, 2), (3, 3)) t(i, j)
        |),
        |jac(it, mat, i, j, val, c, s) AS (
        |  SELECT 0, mat, i, j, val, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM cells
        |  UNION ALL
        |  SELECT it, mat, i, j,
        |    CASE
        |      WHEN skip THEN val
        |      WHEN phase = 1 AND mat = 'a' AND j = p THEN cc * colP - ss * colQ
        |      WHEN phase = 1 AND mat = 'a' AND j = q THEN ss * colP + cc * colQ
        |      WHEN phase = 2 AND mat = 'a' AND i = p THEN cc * rowP - ss * rowQ
        |      WHEN phase = 2 AND mat = 'a' AND i = q THEN ss * rowP + cc * rowQ
        |      WHEN phase = 2 AND mat = 'v' AND j = p THEN cc * colP - ss * colQ
        |      WHEN phase = 2 AND mat = 'v' AND j = q THEN ss * colP + cc * colQ
        |      ELSE val
        |    END AS val,
        |    CASE WHEN phase = 1 AND NOT skip THEN cc END AS c,
        |    CASE WHEN phase = 1 AND NOT skip THEN ss END AS s
        |  FROM (
        |    SELECT *,
        |      CASE WHEN phase = 1 THEN abs(apq) <= 1e-300 ELSE cp IS NULL END AS skip,
        |      CASE WHEN phase = 1 THEN 1.0 / sqrt(t * t + 1.0) ELSE cp END AS cc,
        |      CASE WHEN phase = 1 THEN t * (1.0 / sqrt(t * t + 1.0)) ELSE sp END AS ss
        |    FROM (
        |      SELECT *,
        |        CASE WHEN theta >= 0 THEN 1.0 / (theta + sqrt(theta * theta + 1.0))
        |             ELSE -1.0 / (-theta + sqrt(theta * theta + 1.0)) END AS t
        |      FROM (
        |        SELECT *, (aqq - app) / (2.0 * apq) AS theta
        |        FROM (
        |          SELECT it0 + 1 AS it, mat, i, j, val, cp, sp, phase, p, q,
        |            MAX(CASE WHEN mat = 'a' AND i = p AND j = q THEN val END) OVER () AS apq,
        |            MAX(CASE WHEN mat = 'a' AND i = p AND j = p THEN val END) OVER () AS app,
        |            MAX(CASE WHEN mat = 'a' AND i = q AND j = q THEN val END) OVER () AS aqq,
        |            MAX(CASE WHEN j = p THEN val END) OVER (PARTITION BY mat, i) AS colP,
        |            MAX(CASE WHEN j = q THEN val END) OVER (PARTITION BY mat, i) AS colQ,
        |            MAX(CASE WHEN i = p THEN val END) OVER (PARTITION BY mat, j) AS rowP,
        |            MAX(CASE WHEN i = q THEN val END) OVER (PARTITION BY mat, j) AS rowQ
        |          FROM (
        |            SELECT it AS it0, mat, i, j, val, c AS cp, s AS sp,
        |              (it % 2) + 1 AS phase,
        |              CASE (it0 // 2) % 6 WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 0 WHEN 3 THEN 1 WHEN 4 THEN 1 ELSE 2 END AS p,
        |              CASE (it0 // 2) % 6 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 2 WHEN 4 THEN 3 ELSE 3 END AS q
        |            FROM jac WHERE it < 360
        |          )
        |        )
        |      )
        |    )
        |  )
        |),
        |fin AS (SELECT mat, i, j, val FROM jac WHERE it = 360),
        |eig AS (
        |  SELECT i AS idx, val, row_number() OVER (ORDER BY val DESC, i) AS rn
        |  FROM fin WHERE mat = 'a' AND i = j
        |),
        |rawcomp AS (
        |  SELECT t.rn, f.i AS r, f.val AS x, t.val AS eigval
        |  FROM eig t JOIN fin f ON f.mat = 'v' AND f.j = t.idx
        |  WHERE t.rn <= 2
        |),
        |piv AS (
        |  SELECT rn, x AS pval FROM (
        |    SELECT rn, x, row_number() OVER (PARTITION BY rn ORDER BY abs(x) DESC, r ASC) AS k
        |    FROM rawcomp) WHERE k = 1
        |),
        |comp AS (
        |  SELECT rc.rn, rc.r, CASE WHEN p.pval < 0 THEN -rc.x ELSE rc.x END AS w, rc.eigval
        |  FROM rawcomp rc JOIN piv p USING (rn)
        |),
        |wrow AS (
        |  SELECT
        |    MAX(CASE WHEN rn = 1 AND r = 0 THEN w END) AS w10,
        |    MAX(CASE WHEN rn = 1 AND r = 1 THEN w END) AS w11,
        |    MAX(CASE WHEN rn = 1 AND r = 2 THEN w END) AS w12,
        |    MAX(CASE WHEN rn = 1 AND r = 3 THEN w END) AS w13,
        |    MAX(CASE WHEN rn = 2 AND r = 0 THEN w END) AS w20,
        |    MAX(CASE WHEN rn = 2 AND r = 1 THEN w END) AS w21,
        |    MAX(CASE WHEN rn = 2 AND r = 2 THEN w END) AS w22,
        |    MAX(CASE WHEN rn = 2 AND r = 3 THEN w END) AS w23,
        |    MAX(CASE WHEN rn = 1 THEN eigval END) AS eig1,
        |    MAX(CASE WHEN rn = 2 THEN eigval END) AS eig2
        |  FROM comp
        |),
        |tv AS (SELECT (((0.0 + c00) + c11) + c22) + c33 AS total_var FROM covw)
        |SELECT f.vec_id, f.label,
        |  ((((0.0 + (f.e1 * w.w10)) + (f.e2 * w.w11)) + (f.e3 * w.w12)) + (f.e4 * w.w13)) AS pc1,
        |  ((((0.0 + (f.e1 * w.w20)) + (f.e2 * w.w21)) + (f.e3 * w.w22)) + (f.e4 * w.w23)) AS pc2,
        |  w.eig1, w.eig2, t.total_var
        |FROM feat f, wrow w, tv t
        |ORDER BY f.vec_id""".stripMargin,
    // r14 upgrade (was rows-only): the farthest-first greedy replayed as
    // a recursive CTE over one packed-lists row (ids + embeddings sorted
    // by vec_id). Each step argmaxes {'d2', 'negid'} structs — the same
    // (distance desc, id asc) total order as the Spark
    // orderBy(desc(d2), asc(vec_id)) — where d2 is the identical
    // left-to-right sequential sum of (x−c)² over the identical
    // float→double casts, so the compared doubles are bit-equal
    // cross-engine (the q_mmr_diversify precedent). Radii are
    // round(sqrt(d2), 6) on both sides; the seed pick is the min vec_id
    // (= packed index 1) with radius 0.0 standing in for the undefined
    // first coverage radius, exactly as the Spark side emits.
    "q_coreset" ->
      """WITH v AS (
        | SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
        | FROM embeddings),
        |p AS (
        | SELECT list(vec_id ORDER BY vec_id) AS ids,
        |        list(emb ORDER BY vec_id) AS embs,
        |        count(*)::BIGINT AS n FROM v),
        |rec AS (
        | WITH RECURSIVE r(step, picked, radii) AS (
        |  SELECT 1, CAST([1] AS BIGINT[]), CAST([0.0] AS DOUBLE[]) FROM p
        |  UNION ALL
        |  SELECT r.step + 1,
        |   list_append(r.picked,
        |    (list_max(list_transform(range(1, p.n + 1), i ->
        |      {'d2': list_min(list_transform(r.picked, c ->
        |               list_sum(list_transform(range(1, len(p.embs[i]) + 1), k ->
        |                 (p.embs[i][k] - p.embs[c][k]) * (p.embs[i][k] - p.embs[c][k]))))),
        |       'negid': -p.ids[i], 'i': i}))).i),
        |   list_append(r.radii,
        |    round(sqrt((list_max(list_transform(range(1, p.n + 1), i ->
        |      {'d2': list_min(list_transform(r.picked, c ->
        |               list_sum(list_transform(range(1, len(p.embs[i]) + 1), k ->
        |                 (p.embs[i][k] - p.embs[c][k]) * (p.embs[i][k] - p.embs[c][k]))))),
        |       'negid': -p.ids[i], 'i': i}))).d2), 6))
        |  FROM r, p WHERE r.step < 8)
        | SELECT picked, radii FROM r WHERE step = 8)
        |SELECT CAST(t.k AS BIGINT) AS sel_idx,
        | p.ids[rec.picked[t.k]] AS vec_id,
        | rec.radii[t.k] AS radius
        |FROM rec, p, range(1, 9) t(k)
        |ORDER BY sel_idx""".stripMargin,
    "q_epoch_shuffle" ->
      """WITH t AS (
        | SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':' || '1') AS h
        | FROM documents),
        |sh AS (
        | SELECT doc_id, h,
        |  ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
        |   (instr('0123456789abcdef', substr(h, 2, 1)) - 1)) % 8 AS shard
        | FROM t),
        |r AS (
        | SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS rn
        | FROM sh)
        |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
        | CAST(sum(doc_id * rn) AS BIGINT) AS order_checksum
        |FROM r GROUP BY shard ORDER BY shard""".stripMargin,
    "q_ab_test" ->
      """WITH p AS (
        | SELECT user_id % 2 AS va, CAST(round(value * 100) AS BIGINT) AS vc
        | FROM events WHERE event_type = 'purchase'),
        |st AS (
        | SELECT
        |  CAST(sum(CASE WHEN va = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN va = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN va = 0 THEN vc ELSE 0 END) AS BIGINT) AS s_a,
        |  CAST(sum(CASE WHEN va = 1 THEN vc ELSE 0 END) AS BIGINT) AS s_b,
        |  CAST(sum(CASE WHEN va = 0 THEN vc * vc ELSE 0 END) AS BIGINT) AS ss_a,
        |  CAST(sum(CASE WHEN va = 1 THEN vc * vc ELSE 0 END) AS BIGINT) AS ss_b
        | FROM p),
        |v AS (
        | SELECT *,
        |  (ss_a - CAST(s_a AS DOUBLE) * s_a / n_a) / (n_a - 1) / 10000.0 AS var_a,
        |  (ss_b - CAST(s_b AS DOUBLE) * s_b / n_b) / (n_b - 1) / 10000.0 AS var_b
        | FROM st)
        |SELECT n_a, n_b,
        | round(CAST(s_a AS DOUBLE) / n_a / 100.0, 4) AS mean_a,
        | round(CAST(s_b AS DOUBLE) / n_b / 100.0, 4) AS mean_b,
        | round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / 100.0 /
        |       sqrt(var_a / n_a + var_b / n_b), 4) AS z,
        | CAST(abs(round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / 100.0 /
        |       sqrt(var_a / n_a + var_b / n_b), 4)) > 1.96 AS BIGINT) AS significant
        |FROM v""".stripMargin,
    "q_temporal_split" ->
      """WITH w AS (
        | SELECT user_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n
        | FROM events)
        |SELECT CASE WHEN rn * 5 <= n * 4 THEN 'train' ELSE 'test' END AS split,
        | count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
        |FROM w GROUP BY 1 ORDER BY split""".stripMargin,
    "q_dataset_card" ->
      """WITH base AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
        |  count(DISTINCT lang) AS n_langs
        | FROM documents GROUP BY source),
        |dups AS (
        | SELECT source, CAST(sum(c - 1) AS BIGINT) AS n_dup_docs FROM (
        |  SELECT source, text, count(*) AS c FROM documents GROUP BY 1, 2)
        | GROUP BY source),
        |med AS (
        | SELECT source, n_chars AS med_chars FROM (
        |  SELECT source, n_chars,
        |   row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |   count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        | WHERE rn = (n + 1) // 2)
        |SELECT source, n_docs, n_tokens, n_langs, n_dup_docs, med_chars
        |FROM base JOIN dups USING (source) JOIN med USING (source)
        |ORDER BY source""".stripMargin,
    "q_skyline" ->
      """WITH p AS (
        | SELECT p_brand AS brand, CAST(p_partkey AS BIGINT) AS partkey,
        |  CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |  CAST(p_size AS BIGINT) AS size
        | FROM part),
        |w AS (
        | SELECT *,
        |  max(size) OVER (PARTITION BY brand ORDER BY price_c
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_cheaper,
        |  max(size) OVER (PARTITION BY brand ORDER BY price_c
        |    RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS m_same
        | FROM p)
        |SELECT brand, partkey, price_c, size FROM w
        |WHERE (m_cheaper IS NULL OR m_cheaper < size) AND m_same = size
        |ORDER BY brand, price_c, partkey""".stripMargin,
    // shingle convention mirrors q_dedup_jaccard's oracle: distinct word
    // trigrams over whitespace tokens, docs with >= 3 tokens
    "q_containment" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS shingle FROM sh),
        |c AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.nsh AS na,
        |  count(*) AS common
        | FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        | GROUP BY 1, 2, 3)
        |SELECT a_id, b_id, CAST(na AS BIGINT) AS na,
        | CAST(common AS BIGINT) AS common,
        | round(CAST(common AS DOUBLE) / na, 4) AS containment
        |FROM c WHERE common * 5 >= na * 4
        |ORDER BY a_id, b_id""".stripMargin,
    "q_ngram_novelty" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |e AS (SELECT doc_id, len(s) AS nsh, unnest(s) AS shingle FROM sh),
        |f AS (SELECT shingle, min(doc_id) AS first_doc FROM e GROUP BY 1),
        |pd AS (
        | SELECT e.doc_id, max(e.nsh) AS nsh,
        |  sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS n_novel
        | FROM e JOIN f USING (shingle) GROUP BY e.doc_id)
        |SELECT d.source, count(*) AS n_docs,
        | round(avg(CAST(pd.n_novel AS DOUBLE) / pd.nsh), 4) AS avg_novelty
        |FROM documents d JOIN pd ON d.doc_id = pd.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q_attribution" ->
      """WITH p AS (
        | SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
        | FROM events WHERE event_type = 'purchase'),
        |t AS (
        | SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us
        | FROM events WHERE event_type IN ('click', 'view')),
        |hits AS (
        | SELECT p.p_id, t.channel FROM p JOIN t USING (user_id)
        | WHERE t.t_us <= p.p_us AND p.p_us - t.t_us < 86400000000),
        |cnt AS (SELECT p_id, channel, count(*) AS c FROM hits GROUP BY 1, 2),
        |tot AS (SELECT p_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |att AS (
        | SELECT channel,
        |  round(sum(c * (1000000 // n)) / 1e6, 4) AS credit,
        |  count(DISTINCT cnt.p_id) AS n_purchases
        | FROM cnt JOIN tot USING (p_id) GROUP BY channel),
        |dir AS (
        | SELECT 'direct' AS channel,
        |  round(CAST(count(*) AS DOUBLE), 4) AS credit,
        |  count(*) AS n_purchases
        | FROM p WHERE p_id NOT IN (SELECT p_id FROM tot))
        |SELECT * FROM att UNION ALL SELECT * FROM dir ORDER BY channel""".stripMargin,
    // identical polynomial rolling hash (base 31, window 8, divisor 64),
    // exact int64 arithmetic: max term 0xFFFF·31⁷ ≈ 1.8e15, ×8 < 2⁶³
    "q_cdc_chunks" ->
      """WITH c AS (
        | SELECT doc_id, source, text,
        |  list_transform(string_split_regex(text, ''),
        |    ch -> CAST(ascii(ch) AS BIGINT)) AS codes
        | FROM documents),
        |b AS (
        | SELECT doc_id, source, text, len(codes) AS n,
        |  list_concat(
        |   list_filter(range(8, greatest(len(codes), 8) + 1),
        |    i -> i < len(codes) AND
        |     list_sum(list_transform(range(1, 9),
        |       j -> codes[i - 8 + j] *
        |            ([1, 31, 961, 29791, 923521, 28629151, 887503681,
        |              27512614111][j]))) % 64 = 0),
        |   [CAST(len(codes) AS BIGINT)]) AS bounds
        | FROM c),
        |sp AS (
        | SELECT doc_id, source,
        |  unnest(list_zip(list_concat([CAST(0 AS BIGINT)],
        |            bounds[1:len(bounds)-1]), bounds)) AS z
        | FROM b),
        |ck AS (
        | SELECT doc_id, source,
        |  substr(c.text, CAST(z[1] + 1 AS INT),
        |         CAST(z[2] - z[1] AS INT)) AS chunk
        | FROM sp JOIN c USING (doc_id, source))
        |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
        | round(avg(length(chunk)), 4) AS avg_chunk_len,
        | count(DISTINCT md5(chunk)) AS n_distinct_chunks,
        | round(1.0 - CAST(count(DISTINCT md5(chunk)) AS DOUBLE) / count(*), 4)
        |   AS dup_ratio
        |FROM ck GROUP BY source ORDER BY source""".stripMargin,
  )
}
