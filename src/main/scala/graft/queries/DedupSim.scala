package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.{Dedup, SignatureStore}
import graft.similarity.Similarity

/** Dedup + similarity-search query registry (training-data-pipeline layer).
  * Oracle-paired where the algorithm is portable ANSI SQL (exact dedup,
  * inverted-index Jaccard, brute-force cosine); hash-dependent variants
  * (MinHash/SimHash/LSH — xxhash64 isn't portable) are deterministic
  * rows-only queries verified against planted duplicates in the specs,
  * with portable-hash variants ([[qMinhashPortable]], and
  * q_simhash_portable in Analytics38) holding the shared pipeline
  * shapes to full DuckDB oracles.
  */
object DedupSim {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup: duplicate groups by full-content equality. */
  val qDedupExact: Q = (s, d) =>
    Dedup.exactDupGroups(Tables.documents(s, d))
      .orderBy("keep_id")

  /** N-gram (3-shingle) Jaccard near-dup pairs, inverted-index join with
    * the DF-16 skew cap active (hot shingles excluded from the join, exact
    * hot-overlap correction after — measured exactness-safe here: every
    * qualifying pair keeps a cold common shingle at cap ≥ 10). */
  val qDedupJaccard: Q = (s, d) =>
    Dedup.jaccardPairs(Tables.documents(s, d), 0.6, maxDf = 16)
      .orderBy("a_id", "b_id")

  /** Near-dup cluster resolution: the Jaccard pairs collapsed into
    * connected components (doc_id → min-id-in-component). The DuckDB
    * oracle computes the same transitive closure with a recursive CTE. */
  val qDedupClusters: Q = (s, d) =>
    Dedup.dupClusters(Dedup.jaccardPairs(Tables.documents(s, d), 0.6, maxDf = 16))
      .orderBy("id")

  /** MinHash+LSH near-dup pairs (bucketed candidates, exact verify). */
  val qDedupMinhash: Q = (s, d) =>
    Dedup.minhashPairs(Tables.documents(s, d), 0.6)
      .orderBy("a_id", "b_id")

  /** Portable-MinHash certificate (r15 — the q_simhash_portable /
    * q_pca_portable pattern): the COMPLETE minhash-LSH pipeline shape —
    * distinct word-3-gram shingles ([[graft.text.TextFunctions.shingles3]]
    * via [[Dedup.shingled]], the identical prep the production path
    * runs), per-shingle base hash, k = 16 signature mins, 4×4 banding,
    * bucket-join candidates, then EXACT verification over the hash sets
    * — held to a full arithmetic DuckDB oracle. The base hash is the
    * proven-portable md5 word (`conv(substr(md5(shingle),1,8),16,10)`)
    * and the k permutations are universal hashes (aⱼ·h + bⱼ) mod p with
    * literal aⱼ,bⱼ and p = 4294967311 (prime > 2³²) — injective over
    * h < p, so equal mins imply a SHARED shingle hash and every
    * candidate pair has n_common ≥ 1 by construction. Output is
    * all-integer (sizes, intersections, signature agreement count,
    * τ = 0.6 verdict via 5·common ≥ 3·union), so the oracle is
    * bit-exact with no float discipline needed. The production
    * q_dedup_minhash keeps xxhash64 (one multiply-xor chain per
    * shingle, no digest) and stays adjudicated rows-only; this row
    * certifies the banding/verification ALGORITHM cross-engine,
    * including its false-candidate behavior (band collisions that fail
    * exact verification surface as is_dup = 0 rows). */
  val qMinhashPortable: Q = (s, d) => {
    val P = 4294967311L
    // hs feeds FOUR consumers (signatures, sizes, both sides of the
    // exact-verify join) and pm three (banding, both sides of the
    // signature-agreement join) — without materialization each consumer
    // replayed the md5+explode+distinct pipeline (ProfileQuery r15:
    // duplicate 1.8 s broadcast-build jobs). Both frames are compact
    // ((doc, hash) longs / (doc, j, min) longs); checkpoint once.
    val hs = Dedup.shingled(Tables.documents(s, d))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(shingle), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .distinct()
      .localCheckpoint()
    val perms = array((0 until 16).map(j => struct(
      lit(j).as("j"), lit(1000003L + 2L * j).as("a"), lit(777007L + j).as("b"))): _*)
    val pm = hs.select(col("doc_id"), col("h"), explode(perms).as("p"))
      .groupBy(col("doc_id"), col("p.j").as("j"))
      .agg(min((col("p.a") * col("h") + col("p.b")) % lit(P)).as("m"))
      .localCheckpoint()
    val bk = pm.groupBy(col("doc_id"), expr("j div 4").as("band"))
      .agg(concat_ws(",", (0 until 4).map(r =>
        max(when(pmod(col("j"), lit(4)) === r, col("m"))).cast("string")): _*)
        .as("key"))
    val cand = bk.as("x").join(bk.as("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val sizes = hs.groupBy("doc_id").agg(count(lit(1)).as("nh"))
    val common = cand
      .join(hs.select(col("doc_id").as("a_id"), col("h")), Seq("a_id"))
      .join(hs.select(col("doc_id").as("b_id"), col("h")), Seq("b_id", "h"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_common"))
    val sigm = cand
      .join(pm.select(col("doc_id").as("a_id"), col("j"), col("m").as("ma")), Seq("a_id"))
      .join(pm.select(col("doc_id").as("b_id"), col("j"), col("m").as("mb")), Seq("b_id", "j"))
      .groupBy("a_id", "b_id")
      .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("sig_matches"))
    cand.join(common, Seq("a_id", "b_id"))
      .join(sigm, Seq("a_id", "b_id"))
      .join(sizes.select(col("doc_id").as("a_id"), col("nh").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("nh").as("nb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("na"), col("nb"),
        col("n_common"), col("sig_matches"),
        when(lit(5) * col("n_common") >= lit(3) * (col("na") + col("nb") - col("n_common")),
          1L).otherwise(0L).as("is_dup"))
      .orderBy("a_id", "b_id")
  }

  /** SimHash near-dup pairs (64-bit signature, hamming ≤ 10). */
  val qDedupSimhash: Q = (s, d) =>
    Dedup.simhashPairs(Tables.documents(s, d), 10)
      .orderBy("a_id", "b_id")

  /** Cross-run incremental dedup, end-to-end through the PERSISTED store:
    * even-id docs are "yesterday's corpus" — their signatures written to a
    * parquet signature store — and odd-id docs are today's increment,
    * deduped against the store + within-batch without touching yesterday's
    * text. Deterministic rows-only (xxhash64 banding isn't portable SQL);
    * the full-recompute-equality property is spec-proven (DedupSimSpec). */
  /** One scratch ROOT per JVM (isolated from concurrent graft
    * processes), one SUBDIRECTORY per invocation: two concurrent
    * invocations in the same JVM (parallel bench/verify threads) would
    * otherwise overwrite the store one of them is mid-read on —
    * silently wrong rows, not an error. The per-invocation leak is
    * bounded: bench + verify run this query a handful of times against
    * kilobyte-scale stores, all under one auto-cleaned tmp root. */
  private lazy val sigStoreRoot: String =
    java.nio.file.Files.createTempDirectory("graft_sigstore").toString
  private val sigStoreRun = new java.util.concurrent.atomic.AtomicLong(0L)

  val qDedupIncremental: Q = (s, d) => {
    val scratch = s"$sigStoreRoot/run_${sigStoreRun.incrementAndGet()}"
    val docs = Tables.documents(s, d)
    val batch1 = docs.filter(col("doc_id") % 2 === 0)
    val batch2 = docs.filter(col("doc_id") % 2 === 1)
    SignatureStore.write(batch1, scratch)
    Dedup.incrementalPairs(batch2, SignatureStore.read(s, scratch), 0.6)
      .orderBy("a_id", "b_id")
  }

  /** Embedding-cosine near-dup pairs via the LSH-bucketed scale path.
    * The raw corpus has no planted embedding dups (max off-diagonal cosine
    * ~0.51 — near-orthogonal, where no sublinear method can have exact
    * recall), so the query plants deterministic ±2% perturbed copies
    * (cosine ≈ 0.9998 to their originals) and thresholds at 0.9 — a
    * realistic near-dup setting where bucketed candidates + exact verify
    * provably recover every pair; the DuckDB oracle computes the same
    * pairs by exhaustive comparison, so a green row certifies 100% recall
    * of the bucketed plan. Brute [[Similarity.cosinePairs]] stays as the
    * in-spec referee (DedupSimSpec). */
  val qDedupEmbed: Q = (s, d) =>
    Similarity.cosinePairsLsh(Similarity.withPlantedDups(Tables.embeddings(s, d)), 0.9)
      .orderBy("a_id", "b_id")

  /** Brute-force exact cosine top-10 for query vectors vec_id < 5. */
  val qKnnBrute: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
    Similarity.bruteTopK(vecs, vecs.filter(col("vec_id") < 5), 10)
      .orderBy("q_id", "rank")
  }

  /** Int8-quantized exact top-10: integer-dot ranking over 127-scaled
    * unit vectors — bit-stable ordering, 4× smaller corpus residency
    * (see [[graft.similarity.Similarity.quantizedTopK]]). */
  val qKnnQuantized: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
    Similarity.quantizedTopK(vecs, vecs.filter(col("vec_id") < 5), 10)
      .orderBy("q_id", "rank")
  }

  /** LSH-bucketed approximate cosine top-10 (scale path 1). */
  val qKnnLsh: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
    Similarity.lshTopK(vecs, vecs.filter(col("vec_id") < 5), 10)
      .orderBy("q_id", "rank")
  }

  /** IVF cell-probed approximate cosine top-10 (scale path 2). */
  val qKnnIvf: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
    graft.similarity.Ivf.topK(vecs, vecs.filter(col("vec_id") < 5), 10)
      .orderBy("q_id", "rank")
  }

  /** Product-quantized approximate top-10 (scale path 3): 8-byte packed
    * codes, ADC shortlist, exact re-rank — [[graft.similarity.Pq]].
    * Rows-only (k-means codebooks aren't SQL-portable); recall vs brute
    * and shortlist-membership properties are spec-pinned (PqSpec). */
  val qKnnPq: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
    graft.similarity.Pq.adcTopK(vecs, vecs.filter(col("vec_id") < 5), 10)
      .orderBy("q_id", "rank")
  }

  /** IVF-PQ approximate top-10 (scale path 4): coarse cells × residual
    * product codes — [[graft.similarity.Pq.ivfPqTopK]]. Rows-only;
    * recall, pruning, and exact-sim properties spec-pinned (PqSpec). */
  val qKnnIvfPq: Q = (s, d) => {
    val vecs = Tables.embeddings(s, d)
    graft.similarity.Pq.ivfPqTopK(vecs, vecs.filter(col("vec_id") < 5), 10)
      .orderBy("q_id", "rank")
  }

  /** Per-cluster embedding centroids — the summary step of semantic
    * corpus analysis (cluster quality, drift monitoring, IVF seeding
    * diagnostics): element-wise mean per label, reported as driver-
    * friendly scalars (vector count, centroid L2 norm, mean |component|).
    * Plan: one posexplode → (label, dim) hash-agg (map-side combinable:
    * 64·|labels| groups) → per-label fold — never a whole-vector
    * shuffle, no collect. Oracle replays the dim-indexed unnest. */
  val qEmbedCentroids: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
    val dims = base
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg(col("v").cast("double")).as("m"))
    val stats = dims.groupBy("label").agg(
      round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"),
      round(avg(abs(col("m"))), 6).as("mean_abs"))
    base.groupBy("label").agg(count(lit(1)).as("n_vecs"))
      .join(stats, "label")
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        col("centroid_norm"), col("mean_abs"))
      .orderBy("label")
  }

  /** LEAKAGE-FREE train/val/test split — the composition that makes
    * id-hash splitting safe on a near-duplicated corpus: hashing RAW doc
    * ids lets two near-identical documents land in train and test (the
    * classic eval-contamination bug), so the split key is the near-dup
    * CLUSTER id (min-id connected component over Jaccard ≥ 0.6 edges,
    * singleton docs are their own cluster) — every member of a cluster
    * moves together, by construction. Reuses the cluster closure and the
    * Knuth-permutation bucket verbatim; the only addition is a left join
    * from the corpus to the (small) non-singleton cluster map. */
  val qLeakageSplit: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val clusters = Dedup.dupClusters(Dedup.jaccardPairs(docs, 0.6, maxDf = 16))
    val assigned = docs.select(col("doc_id"))
      .join(clusters, docs("doc_id") === clusters("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    graft.operators.Scale.idSplit(assigned, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy("doc_id")
  }

  /** SemDeDup (Abbas et al. 2023): SEMANTIC dedup — cluster the
    * embedding space, then compare pairs only WITHIN a cluster and drop
    * every vector with a lower-id neighbor above the cosine threshold.
    * The clustering bounds the quadratic: all-pairs O(n²) becomes
    * O(Σ|cellᵢ|²), and the per-cluster self-join is an equality join on
    * the cluster id — no cartesian, no broadcast of the corpus. Cluster
    * count scales with the corpus (n/K bounded ⇒ per-task work bounded);
    * here K = 10·g centroids seeded as per-(label, vec_id mod g) means
    * with g = max(1, n/1000) — CLUSTER COUNT SCALES WITH THE CORPUS
    * (r11 re-shard): cell size stays ~1000/10 ≈ constant as n grows, so
    * Σ|cellᵢ|² is linear in n (the r9 sf1 measurement showed the
    * fixed-K profile stepping 8.2× per 10× — each cell was growing
    * 10×). g = 1 at the driver's correctness SFs (n ≤ 1000), so the
    * result set there is byte-identical to the fixed-K form — the spec
    * proves the invariance and the planted-dup recall under g > 1.
    * Assignment (r12) is a HIERARCHICAL coarse quantizer — the n×K
    * flat scan the r11 form used is quadratic overall (K ∝ n), which
    * the third-decade arithmetic makes prohibitive (sf100: 3M aug rows
    * × 20k centroids = 6×10¹⁰ dot-rows). Shards form a THREE-LEVEL
    * tree with branching b = ⌈g^{1/3}⌉ (top = shard div b², mid =
    * shard div b): level 1 scores the 10·⌈g/b²⌉ TOP centroids (mean
    * over the raw member vectors, same 6dp discipline), level 2 the
    * winning top's ≤ b mid centroids, level 3 the winning mid's ≤ b
    * leaf centroids. Per-row work falls from 10g to ~10·g^{1/3}+2b
    * dots (sf100: 20,000 → ~146), total assignment Θ(n²/100) →
    * Θ(n^{4/3}) — and each level is the same broadcast join +
    * partial-aggregable min(struct(negscore, id)) shape as before (no
    * driver collect, no K-literal expression). At g = 1 every level
    * has one candidate per label, so the descent IS the flat argmax —
    * byte-identical results at the fixed-K SFs by construction. b is
    * derived from round(g^{1/3}) with an exact integer-cube correction
    * so both engines compute the identical branching. Beyond the third
    * decade, deepen the tree further (g^{1/L} branching, exponent
    * n^{1+1/L}) or swap the top level for a centroid LSH probe (the
    * approximate production path at true 100 TB).
    *
    * Cross-engine determinism: centroid components are round(·,6)'d
    * BEFORE assignment (partition-order double sums differ in ulps),
    * assignment score is dot(v,c)/|c| (row norm dropped — constant per
    * row, fewer float ops to match), ties break to the lower cluster
    * id, and pair cosines are round(·,6)'d before thresholding — the
    * exact discipline the embed-dedup oracle already certifies.
    * Planted ±2% perturbed copies (cosine ≈ 0.9998) give the threshold
    * real positives, as in [[qDedupEmbed]]. */
  /** Smallest b ≥ 1 with b^levels ≥ g — round(g^{1/levels}) plus an
    * exact integer-power correction, so Spark and DuckDB (same formula
    * in the oracle) agree regardless of pow() ulps. */
  def rootCeil(g: Long, levels: Int): Long = {
    def ipow(x: Long, e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * x)
    val b0 = math.rint(math.pow(g.toDouble, 1.0 / levels)).toLong
    math.max(1L,
      if (ipow(b0 - 1, levels) >= g) b0 - 1
      else if (ipow(b0, levels) >= g) b0
      else b0 + 1)
  }

  /** Back-compat alias: the three-level branching factor. */
  def cbrtCeil(g: Long): Long = rootCeil(g, 3)

  def semdedup(base: org.apache.spark.sql.DataFrame, g: Long): org.apache.spark.sql.DataFrame =
    semdedup(base, g, 3)

  /** The descent generalized to `levels` L (r13, VERDICT r12 task 5):
    * branching b = ⌈g^{1/L}⌉, level ℓ ∈ 0..L−1 keys shards by
    * shard div b^{L−1−ℓ} (ℓ = L−1 is the leaf level, key = shard), so
    * per-row assignment work is ~10·⌈g/b^{L−1}⌉ + (L−1)·b dots and
    * total assignment cost Θ(n^{1+1/L}). MEASURED crossover (PLANS.md
    * r14 depth probe, g = 30,000 direct): the per-row dots the depth
    * knob optimizes stop being the bottleneck once any descent exists
    * — each extra level costs a FULL-CORPUS centroid aggregation
    * (explode to (label, node, dim)) plus one more per-row pass, all
    * ∝ n, so **L = 4 is 2.2× slower than L = 3 at 620 k rows and 4.1×
    * at 2 M** and the gap widens with corpus size. L = 3 stays the
    * default until g reaches ~10⁶, where an L = 3 leaf slice
    * (10·⌈g/b²⌉) is again thousands of dots. Every level is the same
    * packed-array
    * + per-row [[graft.functions.TreeArgmaxDot]] pattern; levels
    * collapse automatically when b^{L−1−ℓ} ≥ g (one node per label), so
    * deeper trees degrade gracefully to the flat argmax at small g. */
  def semdedup(base: org.apache.spark.sql.DataFrame, g: Long,
               levels: Int): org.apache.spark.sql.DataFrame = {
    require(levels >= 1, s"levels must be >= 1 (got $levels)")
    val b = rootCeil(g, levels)      // tree branching factor
    def ipow(x: Long, e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * x)
    // level ℓ: shard divisor b^{L-1-ℓ}; node count per label N_ℓ = ⌈g/div⌉
    val divs = (0 until levels).map(l => ipow(b, levels - 1 - l))
    val ns = divs.map(dv => (g + dv - 1L) / dv)
    // one exploded (label, shard, dim, v) frame feeds every level's
    // centroid agg — L linear map-side-combined passes
    val dims = base
      .select(col("label"), (col("vec_id") % g).as("shard"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
    // per-level centroids over the RAW member vectors, 6dp-rounded;
    // flat node id = label·N_ℓ + nk (lexicographic in (label, nk) since
    // nk < N_ℓ — the cross-level tie order both engines share); parent
    // id = label·N_{ℓ-1} + nk div b (monotone in the node id, so each
    // parent's children pack into a contiguous binary-searchable slice)
    val levelCents = (0 until levels).map { l =>
      val keyed = dims.withColumn("nk", expr(s"shard div ${divs(l)}L"))
        .groupBy("label", "nk", "dim").agg(round(avg("v"), 6).as("m"))
        .groupBy("label", "nk")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("p"))
      val par =
        if (l == 0) lit(0L)
        else (col("label") * ns(l - 1) + expr(s"nk div ${b}L")).cast("long")
      keyed.select(
        (col("label") * ns(l) + col("nk")).cast("long").as("id"),
        par.as("par"),
        expr("transform(p, x -> x.m)").as("vec"))
        .withColumn("w", Similarity.l2norm(col("vec")))
    }
    val aug = Similarity.prepared(Similarity.withPlantedDups(base))
      .select("vec_id", "emb", "nrm")
    // each centroid level packed into ONE row of aligned arrays sorted
    // by id — the whole tree rides a single ~(K·dim·8)-byte broadcast
    // row, no driver collect
    def pack(df: org.apache.spark.sql.DataFrame, pfx: String) = df
      .agg(array_sort(collect_list(struct(
        col("id"), col("par"), col("vec").as("v"), col("w")))).as("p"))
      .select(expr("transform(p, x -> x.id)").as(s"${pfx}_ids"),
        expr("transform(p, x -> x.par)").as(s"${pfx}_par"),
        expr("transform(p, x -> x.v)").as(s"${pfx}_vecs"),
        expr("transform(p, x -> x.w)").as(s"${pfx}_nrms"))
    val packed = levelCents.zipWithIndex
      .map { case (df, l) => pack(df, s"l$l") }
      .reduce((a, c) => a.join(broadcast(c)))
    // the L-level descent as L nested per-row expressions — argmax of
    // dot(emb, c)/|c| over the current node's children, ties to the
    // lower id: the exact total order of the oracle's ORDER BY score
    // DESC, id ASC at each level. Replaces the former broadcast-join +
    // min(struct(−score, id)) per level: the join form pushes
    // n × candidates rows through a struct-allocating hash aggregate
    // (the measured sf100 hot spot); this form is one fused loop per row
    import graft.functions.TreeArgmaxDot.tree_argmax_dot
    // one SELECT, descents nested — chained withColumns would re-copy
    // the multi-MB packed arrays into every intermediate output row
    // (n × pack-size memcpy); nesting keeps them read-only broadcast
    // references and emits only (cl, vec_id, emb, nrm)
    val leafWant = (0 until levels).foldLeft(lit(-1L)) { (want, l) =>
      tree_argmax_dot(col("emb"), col(s"l${l}_ids"),
        col(s"l${l}_par"), col(s"l${l}_vecs"), col(s"l${l}_nrms"), want)
    }
    val assigned = aug.join(broadcast(packed))
      .select(leafWant.as("cl"), col("vec_id"), col("emb"), col("nrm"))
    val a = assigned.select(col("cl"), col("vec_id").as("a_id"),
      col("emb").as("ea"), col("nrm").as("na"))
    // raw-double prefilter before the 6dp round: Spark's round() on a
    // double goes BigDecimal.valueOf → Double.toString → BigInteger
    // parse (~µs/call — the measured sf31 hot spot at ~10⁸ candidate
    // pairs); any pair with round(sim,6) ≥ 0.9 has raw sim ≥ 0.8999995,
    // so gating at 0.899999 (5×10⁻⁷ slack ≫ double repr error) is
    // semantics-neutral and rounds only the survivors. The rounded
    // filter stays as the semantic gate, mirroring the oracle.
    val pairs = a.join(
        assigned.select(col("cl"), col("vec_id").as("b_id"),
          col("emb").as("eb"), col("nrm").as("nb")),
        Seq("cl"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("rawsim",
        Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("rawsim") >= 0.899999)
      .withColumn("sim", round(col("rawsim"), 6))
      .filter(col("sim") >= 0.9)
    pairs.groupBy(col("b_id").as("vec_id"), col("cl"))
      .agg(count(lit(1)).as("n_partners"), max("sim").as("max_sim"))
      .select(col("vec_id"), col("cl").as("cluster"),
        col("n_partners"), col("max_sim"))
      .orderBy("vec_id")
  }

  val qSemdedup: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
    // one bounded driver-side scalar (like the codebook collects): g
    // parameterizes the plan, so it can't stay inside it
    semdedup(base, math.max(1L, base.count() / 1000L))
  }

  /** The SAME semantic-dedup contract at descent depth L = 4 — a
    * CORRECTNESS certificate of the depth generalization, NOT a
    * performance path (the r14 probe measured L = 4 losing 2.2–4.1×
    * to L = 3 at g = 30,000, gap widening with n — see [[semdedup]]'s
    * scaladoc and PLANS.md r14; per-row work ~10·⌈g/b³⌉ + 3b at
    * b = ⌈g^{1/4}⌉), held to a DuckDB oracle GENERATED for depth 4 by
    * [[semdedupOracle]]: the depth-parametric formula is mirrored
    * engine-for-engine, not just the hand-unrolled depth-3 instance.
    * At the driver SFs (g ≤ 2) the deeper tree collapses level by
    * level, so this certifies the collapse arithmetic too. */
  val qSemdedupDeep: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
    semdedup(base, math.max(1L, base.count() / 1000L), 4)
  }

  /** DuckDB oracle for [[semdedup]] at an arbitrary descent depth —
    * the generator that keeps the Spark formula and the oracle formula
    * the same object. Structure per level ℓ: a (label, nk, dim) mean
    * CTE over the raw member vectors (nk = shard div b^{L−1−ℓ}), a
    * packed-list centroid CTE, and a scored/best descent CTE pair
    * restricting level ℓ's candidates to the winner of level ℓ−1
    * (c.nk div b = parent nk), ties ORDER BY score DESC, id ASC with
    * id = label·N_ℓ + nk — the flat-id total order TreeArgmaxDot uses.
    * Depth 3 reproduces the hand-written q_semdedup oracle semantics. */
  private[graft] def semdedupOracle(levels: Int): String = {
    require(levels >= 1)
    def bpow(e: Int): String =
      if (e == 0) "1" else Seq.fill(e)("p.b").mkString(" * ")
    def b0pow(term: String, e: Int): String =
      Seq.fill(e)(term).mkString("*")
    // node count per label at level l: (g + div - 1) // div, div = b^(L-1-l)
    def nExpr(l: Int): String =
      if (l == levels - 1) "p.g"
      else s"((p.g + ${bpow(levels - 1 - l)} - 1) // (${bpow(levels - 1 - l)}))"
    val levelCtes = (0 until levels).map { l =>
      val div = bpow(levels - 1 - l)
      s"""d$l AS (
         | SELECT label, (vec_id % p.g) // ($div) AS nk, u.i AS dim,
         |  round(avg(emb[u.i + 1]), 6) AS m
         | FROM base, params p, unnest(range(0, len(emb))) AS u(i)
         | GROUP BY label, nk, u.i),
         |c$l AS (
         | SELECT label, nk, list(m ORDER BY dim) AS cvec
         | FROM d$l GROUP BY label, nk),
         |n$l AS (
         | SELECT CAST(label AS BIGINT) AS label, nk,
         |  CAST(label * ${nExpr(l)} + nk AS BIGINT) AS id, cvec,
         |  sqrt(list_sum(list_transform(cvec, x -> x * x))) AS w
         | FROM c$l, params p)""".stripMargin
    }.mkString(",\n")
    val descentCtes = (0 until levels).map { l =>
      val from =
        if (l == 0) "v bb, n0 c"
        else s"best${l - 1} bb, params p, n$l c"
      val cond =
        if (l == 0) ""
        else s" WHERE c.label = bb.label AND c.nk // p.b = bb.nk"
      s"""scored$l AS (
         | SELECT bb.vec_id, bb.emb, bb.nrm, c.label, c.nk, c.id,
         |  list_sum(list_transform(range(1, len(bb.emb)+1),
         |    i -> bb.emb[i] * c.cvec[i])) / c.w AS score
         | FROM $from$cond),
         |best$l AS (
         | SELECT vec_id, emb, nrm, label, nk, id
         | FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |         ORDER BY score DESC, id ASC) AS rn FROM scored$l)
         | WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH params AS (
       | SELECT g, b FROM (
       |  SELECT g, greatest(1, CASE
       |    WHEN ${b0pow("(b0-1)", levels)} >= g THEN b0-1
       |    WHEN ${b0pow("b0", levels)} >= g THEN b0 ELSE b0+1 END) AS b
       |  FROM (SELECT g, CAST(round(pow(g, 1.0/$levels)) AS BIGINT) AS b0
       |        FROM (SELECT greatest(1, count(*) // 1000) AS g FROM embeddings)))),
       |base AS (
       | SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS emb
       | FROM embeddings),
       |$levelCtes,
       |pert0 AS (
       | SELECT vec_id, list_transform(range(0, len(emb)),
       |   i -> emb[i+1] * (1.0 + CAST((vec_id*31 + i*7) % 11 - 5 AS DOUBLE) * 0.004)) AS emb
       | FROM base WHERE vec_id % 2 = 0),
       |aug AS (
       | SELECT vec_id, emb FROM base
       | UNION ALL
       | SELECT vec_id + 100000 AS vec_id, emb FROM pert0),
       |v AS (
       | SELECT vec_id, emb,
       |  sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
       | FROM aug),
       |$descentCtes,
       |pairs AS (
       | SELECT a.id AS cl, a.vec_id AS a_id, b.vec_id AS b_id,
       |  round(list_sum(list_transform(range(1, len(a.emb)+1),
       |    i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm), 6) AS sim
       | FROM best${levels - 1} a JOIN best${levels - 1} b
       |   ON a.id = b.id AND a.vec_id < b.vec_id)
       |SELECT b_id AS vec_id, cl AS cluster,
       | count(*) AS n_partners, max(sim) AS max_sim
       |FROM pairs WHERE sim >= 0.9
       |GROUP BY b_id, cl ORDER BY vec_id""".stripMargin
  }

  /** MinHash estimator calibration — the error profile that justifies a
    * dedup threshold choice: over the LSH candidate population (the
    * pairs the dedup path actually adjudicates), compare the 64-hash
    * signature-agreement ESTIMATE against the exact shingle Jaccard,
    * bucketed by exact decile: pair count, mean estimate, mean absolute
    * error (all integer milli). Expected |err| ≈ √(j(1−j)/64) ≈ 60
    * milli — the spec pins the global error band and monotonicity.
    * Rows-only (xxhash64 signatures aren't SQL-portable).
    *
    * 100 TB shape: candidates come from the banding equality join (the
    * minhashPairs shape); the signature join ships 64×8 B per side; the
    * report is an 11-row bucket agg. */
  val qMinhashCalibration: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val buckets = Dedup.bandBuckets(docs)
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val sigs = Dedup.minhashSignatures(docs, 64)
    def side(p: String) = sigs.select(
      col("doc_id").as(s"${p}_id") +:
        (0 until 64).map(j => col(s"m$j").as(s"${p}_m$j")): _*)
    val est = cand.join(side("a"), Seq("a_id")).join(side("b"), Seq("b_id"))
      .withColumn("n_match", (0 until 64)
        .map(j => (col(s"a_m$j") === col(s"b_m$j")).cast("long")).reduce(_ + _))
      .select(col("a_id"), col("b_id"), expr("(n_match * 1000L) div 64").as("est_milli"))
    val hsets = Dedup.shingleHashSets(docs)
    est
      .join(hsets.select(col("doc_id").as("a_id"), col("hs").as("sha")), Seq("a_id"))
      .join(hsets.select(col("doc_id").as("b_id"), col("hs").as("shb")), Seq("b_id"))
      .withColumn("common", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("exact_milli",
        expr("(common * 1000L) div (size(sha) + size(shb) - common)"))
      .groupBy(expr("exact_milli div 100").as("exact_decile"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(est_milli) div count(1)").as("mean_est_milli"),
        expr("sum(abs(est_milli - exact_milli)) div count(1)").as("mean_abs_err_milli"))
      .orderBy("exact_decile")
  }

  val all: Map[String, Q] = Map(
    "q_minhash_calibration" -> qMinhashCalibration,
    "q_dedup_exact" -> qDedupExact,
    "q_semdedup" -> qSemdedup,
    "q_semdedup_deep" -> qSemdedupDeep,
    "q_leakage_split" -> qLeakageSplit,
    "q_dedup_jaccard" -> qDedupJaccard,
    "q_dedup_clusters" -> qDedupClusters,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_minhash_portable" -> qMinhashPortable,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_dedup_embed" -> qDedupEmbed,
    "q_knn_brute" -> qKnnBrute,
    "q_knn_quantized" -> qKnnQuantized,
    "q_knn_lsh" -> qKnnLsh,
    "q_knn_ivf" -> qKnnIvf,
    "q_knn_pq" -> qKnnPq,
    "q_knn_ivfpq" -> qKnnIvfPq,
    "q_embed_centroids" -> qEmbedCentroids,
  )

  val oracles: Map[String, String] = Map(
    // r15: full integer replay of the portable minhash-LSH pipeline —
    // shingles (the q_dedup_jaccard idiom), md5 base hash (the
    // q_simhash_portable idiom), universal-hash mins, ordered band
    // keys, bucket-join candidates, exact set verification.
    "q_minhash_portable" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
        |   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
        | FROM toks WHERE len(ts) >= 3),
        |hs AS (
        | SELECT DISTINCT doc_id,
        |   CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h
        | FROM (SELECT doc_id, unnest(s) AS shingle FROM sh) u),
        |perm AS (
        | SELECT doc_id, p.j, min((p.a * h + p.b) % 4294967311) AS m
        | FROM hs, (SELECT j, 1000003 + 2 * j AS a, 777007 + j AS b
        |           FROM range(0, 16) t(j)) p
        | GROUP BY 1, 2),
        |bk AS (
        | SELECT doc_id, j // 4 AS band,
        |        string_agg(CAST(m AS VARCHAR), ',' ORDER BY j) AS key
        | FROM perm GROUP BY 1, 2),
        |cand AS (
        | SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        | FROM bk x JOIN bk y
        |   ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS nh FROM hs GROUP BY 1),
        |common AS (
        | SELECT c.a_id, c.b_id, count(*) AS n_common
        | FROM cand c
        | JOIN hs a ON a.doc_id = c.a_id
        | JOIN hs b ON b.doc_id = c.b_id AND b.h = a.h
        | GROUP BY 1, 2),
        |sigm AS (
        | SELECT c.a_id, c.b_id,
        |   CAST(sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) AS BIGINT) AS sig_matches
        | FROM cand c
        | JOIN perm x ON x.doc_id = c.a_id
        | JOIN perm y ON y.doc_id = c.b_id AND y.j = x.j
        | GROUP BY 1, 2)
        |SELECT c.a_id, c.b_id, sa.nh AS na, sb.nh AS nb, co.n_common, sg.sig_matches,
        |  CASE WHEN 5 * co.n_common >= 3 * (sa.nh + sb.nh - co.n_common)
        |       THEN 1 ELSE 0 END AS is_dup
        |FROM cand c
        |JOIN common co ON co.a_id = c.a_id AND co.b_id = c.b_id
        |JOIN sigm sg ON sg.a_id = c.a_id AND sg.b_id = c.b_id
        |JOIN sizes sa ON sa.doc_id = c.a_id
        |JOIN sizes sb ON sb.doc_id = c.b_id
        |ORDER BY c.a_id, c.b_id""".stripMargin,
    "q_embed_centroids" ->
      """WITH e AS (
        | SELECT label, u.i AS dim, CAST(embedding[u.i + 1] AS DOUBLE) AS v
        | FROM embeddings, unnest(range(0, len(embedding))) AS u(i)),
        |c AS (SELECT label, dim, avg(v) AS m FROM e GROUP BY 1, 2),
        |s AS (SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm,
        |       round(avg(abs(m)), 6) AS mean_abs
        |      FROM c GROUP BY 1),
        |n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1)
        |SELECT CAST(n.label AS BIGINT) AS label, n_vecs, centroid_norm, mean_abs
        |FROM n JOIN s USING (label) ORDER BY label""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents
        |GROUP BY text HAVING count(*) > 1 ORDER BY keep_id""".stripMargin,
    "q_knn_quantized" ->
      """WITH nrm AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        | FROM embeddings),
        |v AS (
        | SELECT vec_id,
        |  list_transform(embedding,
        |    x -> CAST(floor(x::DOUBLE * 127.0 / nrm + 0.5) AS BIGINT)) AS qvec
        | FROM nrm),
        |q AS (SELECT vec_id AS q_id, qvec AS q_qvec FROM v WHERE vec_id < 5),
        |sims AS (
        | SELECT q.q_id, v.vec_id AS n_id,
        |  CAST(list_sum(list_transform(range(1, len(v.qvec)+1),
        |    i -> v.qvec[i] * q.q_qvec[i])) AS BIGINT) AS dot_q
        | FROM q, v WHERE v.vec_id <> q.q_id),
        |r AS (SELECT q_id, n_id, dot_q,
        |       row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS rank
        |      FROM sims)
        |SELECT q_id, rank, n_id, dot_q FROM r WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,
    "q_dedup_jaccard" ->
      """WITH toks AS (
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
        | GROUP BY 1, 2, 3, 4)
        |SELECT a_id, b_id, round(CAST(c AS DOUBLE)/(na+nb-c), 4) AS jaccard
        |FROM common WHERE CAST(c AS DOUBLE)/(na+nb-c) >= 0.6
        |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_clusters" ->
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
        | SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.n)
        |SELECT id, min(n) AS cluster_id FROM r GROUP BY id ORDER BY id""".stripMargin,
    "q_leakage_split" ->
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
        |prs AS (
        | SELECT a_id, b_id FROM common WHERE CAST(c AS DOUBLE)/(na+nb-c) >= 0.6),
        |edges AS (
        | SELECT a_id AS src, b_id AS dst FROM prs
        | UNION ALL
        | SELECT b_id, a_id FROM prs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |r(id, n) AS (
        | SELECT id, id FROM nodes
        | UNION
        | SELECT r.id, e.dst FROM r JOIN edges e ON e.src = r.n),
        |cl AS (SELECT id, min(n) AS cluster_id FROM r GROUP BY id),
        |asg AS (
        | SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        | FROM documents d LEFT JOIN cl ON cl.id = d.doc_id),
        |b AS (
        | SELECT doc_id, cluster_id,
        |  ((((cluster_id % 2147483648) * 2654435761) % 2147483648) * 100)
        |    // 2147483648 AS bucket
        | FROM asg)
        |SELECT doc_id, cluster_id,
        | CASE WHEN bucket < 80 THEN 'train'
        |      WHEN bucket < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_semdedup_deep" -> semdedupOracle(4),
    "q_semdedup" ->
      """WITH params AS (
        | SELECT g, b, (g + b - 1) // b AS nm, (g + b*b - 1) // (b*b) AS nt
        | FROM (
        |  SELECT g, greatest(1, CASE
        |    WHEN (b0-1)*(b0-1)*(b0-1) >= g THEN b0-1
        |    WHEN b0*b0*b0 >= g THEN b0 ELSE b0+1 END) AS b
        |  FROM (SELECT g, CAST(round(pow(g, 1.0/3.0)) AS BIGINT) AS b0
        |        FROM (SELECT greatest(1, count(*) // 1000) AS g FROM embeddings)))),
        |base AS (
        | SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS emb
        | FROM embeddings),
        |cdims AS (
        | SELECT label, vec_id % p.g AS shard, (vec_id % p.g) // p.b AS mid,
        |  u.i AS dim, round(avg(emb[u.i + 1]), 6) AS m
        | FROM base, params p, unnest(range(0, len(emb))) AS u(i)
        | GROUP BY label, shard, mid, u.i),
        |cents AS (
        | SELECT label, mid, shard, list(m ORDER BY dim) AS cvec
        | FROM cdims GROUP BY label, mid, shard),
        |cn AS (
        | SELECT CAST(label AS BIGINT) AS label, mid,
        |  CAST(label * p.g + shard AS BIGINT) AS cl, cvec,
        |  sqrt(list_sum(list_transform(cvec, x -> x * x))) AS cnorm
        | FROM cents, params p),
        |mdims AS (
        | SELECT label, (vec_id % p.g) // (p.b*p.b) AS top,
        |  (vec_id % p.g) // p.b AS mid, u.i AS dim,
        |  round(avg(emb[u.i + 1]), 6) AS m
        | FROM base, params p, unnest(range(0, len(emb))) AS u(i)
        | GROUP BY label, top, mid, u.i),
        |mcents AS (
        | SELECT label, top, mid, list(m ORDER BY dim) AS mvec
        | FROM mdims GROUP BY label, top, mid),
        |mcn AS (
        | SELECT CAST(label AS BIGINT) AS label, top,
        |  CAST(label * p.nm + mid AS BIGINT) AS mid_id, mvec,
        |  sqrt(list_sum(list_transform(mvec, x -> x * x))) AS mnorm
        | FROM mcents, params p),
        |tdims AS (
        | SELECT label, (vec_id % p.g) // (p.b*p.b) AS top, u.i AS dim,
        |  round(avg(emb[u.i + 1]), 6) AS m
        | FROM base, params p, unnest(range(0, len(emb))) AS u(i)
        | GROUP BY label, top, u.i),
        |tcents AS (
        | SELECT label, top, list(m ORDER BY dim) AS tvec
        | FROM tdims GROUP BY label, top),
        |tcn AS (
        | SELECT CAST(label * p.nt + top AS BIGINT) AS tid, tvec,
        |  sqrt(list_sum(list_transform(tvec, x -> x * x))) AS tnorm
        | FROM tcents, params p),
        |pert0 AS (
        | SELECT vec_id, list_transform(range(0, len(emb)),
        |   i -> emb[i+1] * (1.0 + CAST((vec_id*31 + i*7) % 11 - 5 AS DOUBLE) * 0.004)) AS emb
        | FROM base WHERE vec_id % 2 = 0),
        |aug AS (
        | SELECT vec_id, emb FROM base
        | UNION ALL
        | SELECT vec_id + 100000 AS vec_id, emb FROM pert0),
        |v AS (
        | SELECT vec_id, emb,
        |  sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
        | FROM aug),
        |scored0 AS (
        | SELECT v.vec_id, v.emb, v.nrm, tc.tid,
        |  list_sum(list_transform(range(1, len(v.emb)+1),
        |    i -> v.emb[i] * tc.tvec[i])) / tc.tnorm AS score
        | FROM v, tcn tc),
        |best0 AS (
        | SELECT vec_id, emb, nrm, tid // p.nt AS label, tid % p.nt AS top
        | FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |         ORDER BY score DESC, tid ASC) AS rn FROM scored0), params p
        | WHERE rn = 1),
        |scored1 AS (
        | SELECT b.vec_id, b.emb, b.nrm, mc.mid_id,
        |  list_sum(list_transform(range(1, len(b.emb)+1),
        |    i -> b.emb[i] * mc.mvec[i])) / mc.mnorm AS score
        | FROM best0 b JOIN mcn mc ON b.label = mc.label AND b.top = mc.top),
        |best1 AS (
        | SELECT vec_id, emb, nrm, mid_id // p.nm AS label, mid_id % p.nm AS mid
        | FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |         ORDER BY score DESC, mid_id ASC) AS rn FROM scored1), params p
        | WHERE rn = 1),
        |scored2 AS (
        | SELECT b.vec_id, b.emb, b.nrm, c.cl,
        |  list_sum(list_transform(range(1, len(b.emb)+1),
        |    i -> b.emb[i] * c.cvec[i])) / c.cnorm AS score
        | FROM best1 b JOIN cn c ON b.label = c.label AND b.mid = c.mid),
        |assigned AS (
        | SELECT vec_id, emb, nrm, cl
        | FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |         ORDER BY score DESC, cl ASC) AS rn FROM scored2)
        | WHERE rn = 1),
        |pairs AS (
        | SELECT a.cl, a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_sum(list_transform(range(1, len(a.emb)+1),
        |    i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm), 6) AS sim
        | FROM assigned a JOIN assigned b
        |   ON a.cl = b.cl AND a.vec_id < b.vec_id)
        |SELECT b_id AS vec_id, cl AS cluster,
        | count(*) AS n_partners, max(sim) AS max_sim
        |FROM pairs WHERE sim >= 0.9
        |GROUP BY b_id, cl ORDER BY vec_id""".stripMargin,
    "q_dedup_embed" ->
      """WITH base AS (
        | SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
        | FROM embeddings),
        |pert0 AS (
        | SELECT vec_id, list_transform(range(0, len(emb)),
        |   i -> emb[i+1] * (1.0 + CAST((vec_id*31 + i*7) % 11 - 5 AS DOUBLE) * 0.004)) AS emb
        | FROM base WHERE vec_id % 2 = 0),
        |aug AS (
        | SELECT vec_id, emb FROM base
        | UNION ALL
        | SELECT vec_id + 100000 AS vec_id, emb FROM pert0),
        |v AS (
        | SELECT vec_id, emb,
        |  sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
        | FROM aug)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_sum(list_transform(range(1, len(a.emb)+1),
        |   i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm), 6) AS sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(range(1, len(a.emb)+1),
        |   i -> a.emb[i] * b.emb[i])) / (a.nrm * b.nrm), 6) >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,
    "q_knn_brute" ->
      """WITH v AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        | FROM embeddings),
        |q AS (SELECT * FROM v WHERE vec_id < 5),
        |sims AS (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  round(list_sum(list_transform(range(1, len(q.embedding)+1),
        |    i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
        |   / (q.nrm * c.nrm), 6) AS sim
        | FROM q, v c WHERE q.vec_id <> c.vec_id),
        |r AS (SELECT q_id, n_id, sim,
        |       row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        |      FROM sims)
        |SELECT q_id, rank, n_id, sim FROM r WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,
  )
}
