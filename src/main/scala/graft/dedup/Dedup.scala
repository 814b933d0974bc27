package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

/** Near-duplicate detection over a documents table — the core
  * training-data-pipeline dedup suite: exact, n-gram-Jaccard
  * (inverted-index set-similarity join), MinHash+LSH banding, SimHash.
  *
  * Scale design (the 100 TB story):
  *  - Exact dedup is one hash-agg shuffle on the content key.
  *  - The Jaccard join never builds the O(n²) cross product: it explodes
  *    shingles into an inverted index and joins on shingle, so cost is
  *    Σ_shingle |docs(shingle)|² — near-linear when shingles are
  *    discriminative. Two variants, picked per data shape: direct
  *    count-aggregation ([[jaccardPairs]]) and PPJoin-style prefix
  *    filtering ([[jaccardPairsPrefix]]) for web-scale corpora.
  *  - MinHash/LSH reduces candidate generation to equality joins on band
  *    signatures — O(n·bands) shuffle, then exact verification only on
  *    bucket collisions. This is the path that survives 1000 executors.
  *  - SimHash packs a doc into 64 bits; banding on 16-bit words gives
  *    candidates, bit_count(xor) verifies. Cheapest per-doc state.
  */
object Dedup {

  /** (doc_id, shingles) with shingle-count — shared prep. The scan is
    * fanned out first (r15, [[graft.operators.Scale.fanOutScan]]):
    * tokenize+shingle+hash is the repo's most CPU-heavy per-row stage,
    * and a one-row-group parquet input otherwise pins it to one core
    * (measured 0.5–0.6 s single-task stages at sf0.1). No-op at scale. */
  def shingled(docs: DataFrame): DataFrame =
    graft.operators.Scale.fanOutScan(docs)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", shingles3(col("toks")))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("nsh"))

  /** Exact duplicate groups by full-content equality, hash-first: the
    * wide shuffle runs over (xxhash64(text), doc_id) — 16 bytes/row
    * instead of whole documents — and only docs whose hash collides
    * (the duplicate candidates, a tiny fraction of a deduped-at-ingest
    * corpus) rejoin their text for the EXACT group-by, so a 2⁻⁶⁴ hash
    * collision can never produce a false duplicate group. Same output as
    * the naive groupBy(text), at a fraction of the shuffle width. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    dupCandidates(docs)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("keep_id", "n_copies")

  /** The shared hash-first candidate derivation: docs whose content hash
    * collides with another doc's — the only rows that can possibly be
    * exact duplicates, and the only rows whose text the exact group-bys
    * above/below ever shuffle. */
  private def dupCandidates(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
    val dupHashes = hashed.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("h")
    val candIds = hashed.join(dupHashes, Seq("h")).select("doc_id")
    docs.join(candIds, Seq("doc_id"), "left_semi")
  }

  /** Doc ids to DROP under keep-min-id exact dedup — the complement view
    * of [[exactDupGroups]] a curation pipeline consumes (anti-join these
    * away and every content group keeps exactly its min-id doc). Same
    * hash-first shape: wide shuffle on 16-byte rows, exact text group-by
    * only over hash-colliding candidates. */
  def exactDupLosers(docs: DataFrame): DataFrame = {
    val candDocs = dupCandidates(docs)
    val keepIds = candDocs.groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    candDocs.select("doc_id").join(keepIds, Seq("doc_id"), "left_anti")
  }

  /** Benchmark decontamination: corpus docs sharing ANY word 3-gram with
    * the probe set (an eval benchmark) are flagged for removal. The probe
    * side's distinct shingles are broadcast — eval sets are tiny next to
    * a training corpus — so the scan-side work is one semi-join per
    * shingle, no shuffle of the corpus. Returns flagged doc_ids. */
  def contaminatedBy(docs: DataFrame, probes: DataFrame): DataFrame = {
    val probeShingles = shingled(probes)
      .select(explode(col("sh")).as("shingle")).distinct()
    shingled(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .join(broadcast(probeShingles), Seq("shingle"), "left_semi")
      .select("doc_id").distinct()
  }

  /** GRADED contamination — the overlap metric behind [[contaminatedBy]]'s
    * binary flag: per corpus doc, the fraction of its distinct word
    * 3-grams that appear anywhere in the probe set. A decontamination
    * policy thresholding on overlap (drop ≥ 0.8, keep ≤ 0.05, review
    * between) needs the fraction, not the flag; docs too short to
    * shingle are excluded (no denominator). Same scale shape as the flag
    * path: probe shingles broadcast, corpus pays one per-shingle lookup
    * + a map-side-combinable doc_id agg — no corpus shuffle beyond the
    * (doc_id, hit) pairs. Returns (doc_id, n_shingles, overlap). */
  def contaminationOverlap(docs: DataFrame, probes: DataFrame): DataFrame = {
    val probeShingles = shingled(probes)
      .select(explode(col("sh")).as("shingle")).distinct()
      .withColumn("hit", lit(1L))
    shingled(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .join(broadcast(probeShingles), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        round(sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)), 4)
          .as("overlap"))
  }

  /** Benchmark decontamination via a BLOOM-FILTER pre-filter — the shape
    * for probe sets too large to broadcast as a semi-join build side
    * ([[contaminatedBy]]'s limit): the probe shingle set collapses to a
    * fixed-size bit sketch (≈9.6 bits/key at 1% FPP — a 10⁸-shingle
    * benchmark suite is ~120 MB, broadcastable anywhere), the corpus is
    * probed per-row with `might_contain` (no join, no shuffle), and ONLY
    * the surviving ~1%+ε rows pay the exact semi-join that removes bloom
    * false positives. Output is identical to [[contaminatedBy]] — the
    * bloom stage is a one-sided pre-filter, never the verdict. */
  def contaminatedByBloom(docs: DataFrame, probes: DataFrame,
                          expectedProbeShingles: Long = 1L << 20): DataFrame = {
    import graft.functions.BloomFilters._
    val probeShingles = shingled(probes)
      .select(explode(col("sh")).as("shingle")).distinct()
    // the sketch rides a SCALAR SUBQUERY (r16; replaces the r14 driver
    // head() + lit(bytes) literal): the inlined ~1.2 MB binary rendered
    // a 21 MB plan text (the Catalyst-literal blowup class the r15 ANN
    // fix removed), shipped with every task binary, and cost a blocking
    // driver job per call. Bloom bits are insertion-order-independent
    // (set-bit ORs over a deterministic hash), so the sketch — and the
    // one-sided candidate set it admits — is identical either way.
    val sketch = probeShingles
      .agg(bloom_filter_agg(xxhash64(col("shingle")), expectedProbeShingles).as("bf"))
    val candidates = shingled(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .filter(might_contain(bloom_sketch_subquery(sketch), xxhash64(col("shingle"))))
    // NO broadcast hint on the verify join — at the scale this function
    // exists for, the probe set is exactly what can't broadcast; the
    // bloom already shrank the candidate side to ~FPP of the corpus, so
    // a shuffle semi-join of two small-ish sides is the right plan (and
    // at testdata scale AQE broadcasts it on its own anyway)
    candidates
      .join(probeShingles, Seq("shingle"), "left_semi")
      .select("doc_id").distinct()
  }

  /** New-batch doc ids to DROP under cross-run EXACT dedup: docs whose
    * content hash already exists in the store ([[SignatureStore.hashes]])
    * plus non-min-id copies within the batch. Hash-only across runs — the
    * store keeps 16-byte (doc_id, xxhash64) rows, not text, so a 2⁻⁶⁴
    * collision is accepted as the price of not persisting the corpus
    * twice (the batch-mode [[exactDupLosers]] keeps its exact text
    * verification). */
  def incrementalExactLosers(newDocs: DataFrame, store: SignatureStore): DataFrame = {
    val newHashes = newDocs.select(col("doc_id"), xxhash64(col("text")).as("h"))
    val inStore = newHashes
      .join(store.hashes.select("h"), Seq("h"), "left_semi")
      .select("doc_id")
    val keepMin = newHashes.groupBy("h").agg(min("doc_id").as("keep"))
    val withinBatch = newHashes.join(keepMin, Seq("h"))
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id")
    inStore.union(withinBatch).distinct()
  }

  /** N-gram Jaccard near-dup pairs via a PREFIX-FILTERED inverted-index
    * join (PPJoin-style prefix filtering, Xiao et al., WWW'08). Identical
    * output to [[jaccardPairsNaive]], far fewer candidates:
    *
    *  1. hash shingles to 8-byte keys (cheaper shuffle than strings);
    *  2. sort each doc's shingle-hash set (any consistent total order
    *     makes the prefix lemma hold; hash order costs one per-row
    *     array_sort and no extra shuffle — a global rarest-first order
    *     would shrink prefixes further at the price of a frequency agg);
    *  3. index only the first `n - ⌈t·n⌉ + 1` shingles per doc. If
    *     J(a,b) ≥ t then |a∩b| ≥ ⌈t·max(na,nb)⌉, so by pigeonhole the
    *     two prefixes under a common total order must intersect — no
    *     false negatives;
    *  4. candidates additionally length-filtered (t·na ≤ nb ∧ t·nb ≤ na),
    *     then verified EXACTLY via array_intersect on the full sets.
    *
    * When shingles are discriminative (real web-scale text: the shingle
    * space is enormous, most shingles near-unique) the join cost collapses
    * from Σ|docs(shingle)|² over all shingles to the same sum over the
    * ~(1-t)·n prefix shingles only — this is the 100 TB path. On corpora
    * with a tiny shared vocabulary (like this synthetic testdata) the
    * hash-order candidate set degenerates; `rarestFirst = true` orders
    * each doc's shingles by GLOBAL document frequency before taking the
    * prefix (canonical PPJoin ordering) — prefixes then hold the most
    * discriminative shingles. Measured at sf0.1/t=0.6: 291k → 193k
    * candidates (1.5× fewer; 650k → 517k at t=0.35), but on THIS
    * shared-vocab corpus the DF agg + per-doc rebuild costs more wall
    * than the candidate drop saves (0.9 → 1.7 s) — the ordering pays off
    * when the candidate join dominates end-to-end, i.e. discriminative-
    * shingle corpora at real scale, which is why it's a flag. Any single
    * global total order preserves the prefix lemma; (df, h) lexicographic
    * is one. Returns (a_id, b_id, jaccard) ≥ t. */
  def jaccardPairsPrefix(docs: DataFrame, threshold: Double,
                         rarestFirst: Boolean = false): DataFrame = {
    val sh = shingleSets(docs)
    val cand = prefixCandidates(sh, threshold, rarestFirst)
    verifyJaccard(cand, sh.select(col("doc_id"), col("hs")), threshold)
  }

  /** (doc_id, hs sorted-distinct shingle hashes, nsh) — prefix-join prep. */
  private def shingleSets(docs: DataFrame): DataFrame =
    shingled(docs)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(col("sh"), s => xxhash64(s)))).as("hs"))
      .withColumn("nsh", size(col("hs")))

  /** Prefix-filtered candidate pairs (exposed package-private so specs and
    * benches can measure the candidate-set size each ordering produces). */
  private[graft] def prefixCandidates(sh: DataFrame, threshold: Double,
                                      rarestFirst: Boolean): DataFrame = {
    val prefixLen =
      (col("nsh") - ceil(col("nsh") * lit(threshold)) + 1).cast("int")
    val prefixes =
      if (!rarestFirst)
        sh.select(col("doc_id"), col("nsh"),
          explode(slice(col("hs"), lit(1), prefixLen)).as("h"))
      else {
        // global-DF ordering: count each shingle hash's document frequency
        // (one agg over the exploded index), then rebuild each doc's
        // shingle list ordered by (df asc, h) — struct array_sort gives the
        // lexicographic total order — and take the prefix of THAT
        val ex = sh.select(col("doc_id"), col("nsh"), explode(col("hs")).as("h"))
        val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
        ex.join(dfreq, Seq("h"))
          .groupBy("doc_id", "nsh")
          .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ordered"))
          .select(col("doc_id"), col("nsh"),
            explode(transform(slice(col("ordered"), lit(1), prefixLen),
              s => s.getField("h"))).as("h"))
      }
    prefixes.as("x").join(prefixes.as("y"), Seq("h"))
      .filter(col("x.doc_id") < col("y.doc_id") &&
        col("y.nsh") * lit(threshold) <= col("x.nsh") &&
        col("x.nsh") * lit(threshold) <= col("y.nsh"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** Inverted-index Jaccard join with direct count aggregation — every
    * indexed shingle joined, overlap counted by a hash-agg on (a,b) with
    * NO per-pair candidate materialization. The better shape when shingle
    * document-frequency is moderate (shared-vocab corpora, like the
    * synthetic testdata; measured 2× faster than [[jaccardPairsPrefix]]
    * there). The index key is xxhash64(shingle) — an 8-byte join key
    * instead of a ~20-byte string halves the shuffle; a 64-bit collision
    * (~2⁻⁶⁴ per pair) is the only semantic difference vs joining the raw
    * shingle.
    *
    * `maxDf` is the web-scale skew guard: join cost is
    * Σ_shingle |docs(shingle)|², so one stopword trigram appearing in 10⁶
    * docs alone costs 10¹² joined rows. Shingles with document frequency
    * > maxDf are excluded from the JOIN (a broadcast anti-join against
    * the small hot set), and the final Jaccard is then made EXACT again
    * for every surviving pair by adding back the pair's hot-shingle
    * overlap (hot shingles per doc are ≤ a handful of 8-byte hashes, so
    * the correction is a broadcast semi-structure, not a second index
    * join). The only approximation left is recall: a qualifying pair is
    * missed iff ALL of its common shingles are hot — at threshold t such
    * a pair shares ≥ t/(1+t)·(na+nb) shingles, every one in > maxDf docs,
    * which on non-pathological corpora means near-identical stopword-only
    * documents (measured here: every qualifying pair keeps a cold common
    * shingle at any cap ≥ 10 at sf0.1; DedupSpec proves output equality
    * with the uncapped join).
    *
    * The inverted index is explicitly repartitioned on `hs` up front: the
    * self-join needs that exact exchange anyway, and forcing it early
    * means ALL consumers — both join sides, the DF count, the hot-per-doc
    * correction — reuse ONE scan + tokenize + shingle pass (ReuseExchange
    * / AQE stage reuse) instead of each re-deriving the index from the
    * source. A/B re-measured r7 on an idle box (sf0.1, 3 runs each):
    * with 3.6-4.0 s, without 4.9-5.7 s — the r6 bench's apparent
    * regression was machine contention; the repartition stays. r8
    * idle-box re-check: min 2.84 s / median 3.34 s — under the r5
    * 3.5 s anchor; every bench reading above it (r6 4.33, r7 4.22) was
    * contention from the concurrently-running test suite, not a plan
    * regression. */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   maxDf: Int = Int.MaxValue): DataFrame = {
    // The tokenize+shingle+hash pass is materialized ONCE as the
    // compact (doc_id, sorted-hash-array) frame (~8 B per shingle, no
    // text) and the inverted index is its explode: the repartition
    // exchange's map side then writes from pre-hashed arrays instead of
    // running scan→tokenize→shingle→explode inline, and every re-read
    // of the exchange input (AQE re-optimization, the hot-DF pass, the
    // self-join probe side) hits the checkpoint. Measured at sf0.1
    // (local[32], warm): q_dedup_jaccard 2.84 → 1.88 s min,
    // q_curate_full 6.11 → 4.80 s min, q_dedup_clusters 3.3 → 2.63 s.
    // At warehouse scale this frame is the persisted signature table
    // ([[SignatureStore]]), same shape.
    val sets = shingleHashSets(docs).localCheckpoint()
    // r13 payload shrink: the set sizes do NOT ride the inverted index.
    // Carrying nsh meant every index row shuffled 20 B instead of 16 and
    // every joined pair row carried (na, nb) through the count aggregate
    // — the single biggest spill surface at the third decade (the sf100
    // working-set cliff, PLANS.md). Sizes are a per-DOC frame (n rows,
    // derived free from the checkpointed sets), joined onto the POST-agg
    // pair frame — orders of magnitude fewer rows than the pre-agg join
    // output whose width they no longer inflate.
    val sizes = sets.select(col("doc_id"), size(col("hs")).as("nsh"))
    val inv = sets
      .select(col("doc_id"), explode(col("hs")).as("hs"))
      .repartition(col("hs"))
    val capped = maxDf != Int.MaxValue
    // hot = the (small by construction) set of shingle hashes above the cap
    lazy val hot = inv.groupBy("hs").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("hs")
    val indexed =
      if (capped) inv.join(broadcast(hot), Seq("hs"), "left_anti") else inv
    val counted = indexed.as("a").join(indexed.as("b"), col("a.hs") === col("b.hs"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("cold_common"))
      // the two sizes joins carry NO static broadcast hint on purpose
      // (r14, ADVICE adjudication): sizes is a per-DOC frame — DATA-
      // sized, not dimension-sized — so a hard broadcast() would ship
      // ~16 GB at 10⁹ docs and OOM the executors exactly where this
      // pipeline must survive. AQE is the right mechanism: at runtime
      // it sees the actual post-agg sizes (n × 16 B) and converts both
      // joins to broadcasts whenever they fit (MetricsSpec's
      // "jaccardPairs sizes joins" test pins this at test scale),
      // while at 10⁹ docs it keeps the sort-merge join of
      // two id-keyed POST-agg frames — the scale-safe fallback. The
      // r13 payload-shrink win is unaffected either way: what these
      // joins move is the post-agg pair frame, never the pre-agg join
      // output the shrink was about.
      .join(sizes.select(col("doc_id").as("a_id"), col("nsh").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("nsh").as("nb")), Seq("b_id"))
    val corrected =
      if (!capped) counted.withColumn("common", col("cold_common"))
      else {
        // exact hot-overlap correction for surviving pairs only
        val hotPerDoc = inv.join(broadcast(hot), Seq("hs"))
          .groupBy("doc_id").agg(collect_set("hs").as("hh"))
        counted
          .join(hotPerDoc.select(col("doc_id").as("a_id"), col("hh").as("ha")),
            Seq("a_id"), "left")
          .join(hotPerDoc.select(col("doc_id").as("b_id"), col("hh").as("hb")),
            Seq("b_id"), "left")
          .withColumn("common", col("cold_common") +
            coalesce(size(array_intersect(col("ha"), col("hb"))), lit(0)).cast("long"))
      }
    corrected
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Directional containment join: pairs (a, b), a ≠ b, where at least
    * `num`/`den` of a's shingles also appear in b — the asymmetric
    * near-dup Jaccard misses (a short doc quoted whole inside a long one
    * has high containment but low Jaccard, since the union is dominated
    * by the long doc). The threshold is an integer RATIO, compared as
    * `den·common ≥ num·na` — no float threshold anywhere, so the keep
    * decision is bit-identical in any engine.
    *
    * Same inverted-index shape and skew machinery as [[jaccardPairs]]
    * (8-byte xxhash64 join keys, one up-front repartition on the shingle
    * hash shared by every consumer, `maxDf` hot-shingle cap with the
    * exact broadcast correction); the only structural differences are the
    * direction (a ≠ b instead of a < b — both directions of a pair are
    * real, distinct findings here) and the denominator (na, not the
    * union). */
  def containmentPairs(docs: DataFrame, num: Int, den: Int,
                       maxDf: Int = Int.MaxValue): DataFrame = {
    val inv = shingled(docs)
      .select(col("doc_id"), col("nsh"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("nsh"), xxhash64(col("shingle")).as("hs"))
      .repartition(col("hs"))
    val capped = maxDf != Int.MaxValue
    lazy val hot = inv.groupBy("hs").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("hs")
    val indexed =
      if (capped) inv.join(broadcast(hot), Seq("hs"), "left_anti") else inv
    val counted = indexed.as("a").join(indexed.as("b"), col("a.hs") === col("b.hs"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.nsh").as("na"))
      .groupBy("a_id", "b_id", "na")
      .agg(count(lit(1)).as("cold_common"))
    val corrected =
      if (!capped) counted.withColumn("common", col("cold_common"))
      else {
        val hotPerDoc = inv.join(broadcast(hot), Seq("hs"))
          .groupBy("doc_id").agg(collect_set("hs").as("hh"))
        counted
          .join(hotPerDoc.select(col("doc_id").as("a_id"), col("hh").as("ha")),
            Seq("a_id"), "left")
          .join(hotPerDoc.select(col("doc_id").as("b_id"), col("hh").as("hb")),
            Seq("b_id"), "left")
          .withColumn("common", col("cold_common") +
            coalesce(size(array_intersect(col("ha"), col("hb"))), lit(0)).cast("long"))
      }
    corrected
      .filter(col("common") * den >= col("na") * num)
      .select(col("a_id"), col("b_id"), col("na").cast("long").as("na"),
        col("common").cast("long").as("common"),
        round(col("common").cast("double") / col("na"), 4).as("containment"))
  }

  /** MinHash signatures for all docs via explode + 64-way min-aggregate
    * (one shuffle on doc_id; every hash is a cheap long→long xxhash64 in
    * codegen — no higher-order lambdas, whose captured subtrees Spark
    * re-evaluates per element). Output: (doc_id, m0..m{k-1}). */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val hs = shingled(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val minExprs = (0 until k).map(j => min(xxhash64(lit(j), col("h"))).as(s"m$j"))
    hs.groupBy("doc_id").agg(minExprs.head, minExprs.tail: _*)
  }

  /** LSH band buckets per doc: (doc_id, band, bucket) — the banding of
    * the k-hash MinHash signature that drives candidate generation in
    * [[minhashPairs]], and the exact artifact a cross-run signature store
    * persists ([[SignatureStore]]). */
  def bandBuckets(docs: DataFrame, numHashes: Int = 64, bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    minhashSignatures(docs, numHashes)
      .withColumn("bandArr", array((0 until bands).map { b =>
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(j => col(s"m$j")): _*)
      }: _*))
      .select(col("doc_id"), posexplode(col("bandArr")).as(Seq("band", "bucket")))
  }

  /** (doc_id, hs): each doc's sorted shingle-hash set — the exact-verify
    * artifact (one zero-allocation merge pass per candidate via
    * SortedIntersectCount; same 2⁻⁶⁴-collision caveat as the prefix
    * variant's hashed index). */
  def shingleHashSets(docs: DataFrame): DataFrame =
    shingled(docs).select(col("doc_id"),
      array_sort(transform(col("sh"), s => xxhash64(s))).as("hs"))

  /** PER-ROW band-bucket array over a shingle-hash array column — pure
    * expressions, no aggregation, so it runs where a groupBy signature
    * pass can't: inside a streaming micro-batch pipeline. Values are
    * IDENTICAL to [[bandBuckets]]'s (m_j = min over xxhash64(j, h),
    * banded by xxhash64 of each band's row hashes) — spec-pinned, so
    * stream-side candidates match the batch-built store exactly. */
  def bandBucketArray(hs: Column, numHashes: Int = 64, bands: Int = 8): Column = {
    val rowsPerBand = numHashes / bands
    val mins = (0 until numHashes).map(j =>
      array_min(transform(hs, h => xxhash64(lit(j), h))))
    array((0 until bands).map { b =>
      xxhash64(mins.slice(b * rowsPerBand, (b + 1) * rowsPerBand): _*)
    }: _*)
  }

  /** Exact-Jaccard verification of a candidate pair list against sorted
    * shingle-hash sets; emits (a_id, b_id, jaccard) for pairs ≥ t. */
  private def verifyJaccard(cand: DataFrame, hsets: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(hsets.select(col("doc_id").as("a_id"), col("hs").as("sha")), Seq("a_id"))
      .join(hsets.select(col("doc_id").as("b_id"), col("hs").as("shb")), Seq("b_id"))
      .withColumn("common",
        graft.functions.SortedIntersectCount.sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))

  /** MinHash+LSH near-dup pairs: shingle → k-minhash → band → bucket
    * equality join → exact-Jaccard verification of candidates only.
    * Default 64 hashes, 8 bands × 8 rows ⇒ P(caught) ≈ 99% at j=0.9,
    * band false-positive rate ~j_rand⁸ ≈ 0 for unrelated docs. */
  def minhashPairs(docs: DataFrame, threshold: Double,
                   numHashes: Int = 64, bands: Int = 8): DataFrame = {
    val buckets = bandBuckets(docs, numHashes, bands)
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    verifyJaccard(cand, shingleHashSets(docs), threshold)
  }

  /** Cross-run INCREMENTAL near-dup pairs: dedup a NEW batch against the
    * persisted signature store of everything already kept, without
    * re-signing or re-shuffling the historical corpus — the cadence a
    * real training pipeline runs (daily crawl increments appended to a
    * warehouse; the reference's own schedule is a daily append,
    * `/root/reference/spark-bq-dag.py:35,160`).
    *
    * Candidates = (new × store) band-bucket collisions ∪ (new × new)
    * within-batch collisions; each candidate is then exact-Jaccard
    * verified against the union of stored + new shingle-hash sets. With
    * the same hash family and banding, emitted pairs are EXACTLY the
    * full-recompute pairs on (store ∪ new) that involve ≥1 new doc —
    * spec-proven: store(b1) pairs ∪ incremental(b2 | store(b1)) equals
    * minhashPairs(b1 ∪ b2) (DedupSimSpec).
    *
    * Scale shape: the store's buckets are a DISK-BUCKETED table on
    * (band, bucket) ([[SignatureStore.BucketCount]]), so the cross join
    * plans with no exchange on the store side — only the new batch's
    * buckets (tiny vs corpus) shuffle into the store's layout
    * (spec-pinned, DedupSimSpec) — and the store never re-derives
    * signatures. Assumes
    * doc_ids are globally unique across runs (a curation pipeline's
    * invariant). */
  def incrementalPairs(newDocs: DataFrame, store: SignatureStore,
                       threshold: Double,
                       numHashes: Int = 64, bands: Int = 8): DataFrame = {
    // buckets derived from the shingle-hash sets via the per-row
    // expression (spec-pinned bit-identical to the aggregated path): the
    // new batch is tokenized/shingled once per consumer instead of twice,
    // and the batch path stays symmetric with the streaming one
    val newSets = shingleHashSets(newDocs)
    val newBuckets = newSets.select(col("doc_id"),
      posexplode(bandBucketArray(col("hs"), numHashes, bands))
        .as(Seq("band", "bucket")))
    val cross = newBuckets.as("x").join(store.buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
              greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
    val within = newBuckets.as("x").join(newBuckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val cand = cross.union(within).distinct()
    verifyJaccard(cand, store.sets.union(newSets), threshold)
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS — the step a real
    * dedup pipeline runs after any pair generator ([[jaccardPairs]],
    * [[minhashPairs]], embedding pairs): connected components by
    * iterative min-label propagation. Each iteration pushes every node's
    * current cluster label across the (symmetrized) edge list and keeps
    * the min; converges in O(graph diameter) iterations — tiny for
    * near-dup graphs, whose components are near-cliques of copies.
    *
    * Scale shape: each iteration is one equi-join edge⋈label + one
    * hash-agg, both on id keys; `localCheckpoint` after each step cuts
    * the lineage so iteration i doesn't replay 1..i−1 (swap for a
    * reliable checkpoint dir on a real cluster). The edge list is cached
    * across iterations (multi-pass consumer) and released on exit.
    * For web-scale graphs with large diameters the two-phase
    * large-star/small-star algorithm halves rounds; near-dup components
    * don't need it. Returns (doc_id, cluster_id = min id in component)
    * for every doc that appears in some pair. */
  def dupClusters(pairs: DataFrame): DataFrame = {
    val fwd = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
    // src-partitioned cache (r16, guide §2.4 "two ops keyed the same
    // way share one exchange"): the seed groupBy(src) and EVERY round's
    // propagation join key on src, so capturing hashpartitioning(src)
    // once at cache build means no round ever re-exchanges the |E|-row
    // edge list — the per-round shuffle drops to the label frame plus
    // the partial-agg'd propagation output (node-sized), which is what
    // survives at 10⁹-edge pair graphs where labels can't broadcast.
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")).cache()
    // convergence scalar: per-id labels only ever DECREASE (next =
    // min(current, neighbors)) over a fixed id set, so Σ cluster_id
    // strictly decreases until the fixpoint — an exact change detector
    // from one tiny aggregate over the just-checkpointed labels, instead
    // of a join-and-count job per round (decimal(38,0): no ANSI overflow
    // however many 2⁶³-range ids are summed)
    def labelSum(ls: DataFrame): java.math.BigDecimal = {
      val d = ls.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    try {
      // seed = min(self, neighbors): the first propagation round computed
      // directly from the edge list — one fewer loop iteration
      var labels = edges
        .select(col("src").as("id"), least(col("src"), col("dst")).as("cluster_id"))
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()
      var prevSum = labelSum(labels)
      var converged = labels.isEmpty
      while (!converged) {
        // join keyed on src — the edge list is SYMMETRIC by construction
        // (both directions unioned above), so {(dst, label(src))} is the
        // same propagation set as the former {(src, label(dst))}; keying
        // the join on src lets it reuse the cache's captured
        // hashpartitioning(src) instead of re-shuffling edges per round
        val prop = edges.join(labels, edges("src") === labels("id"))
          .select(edges("dst").as("id"), col("cluster_id"))
        val next = labels.union(prop)
          .groupBy("id").agg(min("cluster_id").as("cluster_id"))
          .localCheckpoint()
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
      }
      labels
    } finally edges.unpersist()
  }

  /** 64-bit SimHash per doc as two 32-bit words, computed PER ROW by the
    * codegen'd [[graft.functions.SimHash64]] expression — signing is a
    * pure scan stage: no token explode, no doc_id shuffle, no 64-buffer
    * aggregation (the word split survives only as the downstream column
    * contract; the expression itself is plain Java long math with no
    * ANSI overflow to dodge). Empty-token docs are excluded, matching
    * the aggregated path (explode emitted no row for them). */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    graft.operators.Scale.fanOutScan(docs)
      .filter(size(toks) > 0)
      .select(col("doc_id"),
        graft.functions.SimHash64.simhash64(toks).as("sig"))
      .select(col("doc_id"),
        col("sig").bitwiseAND(lit(0xFFFFFFFFL)).as("w0"),
        shiftrightunsigned(col("sig"), 32).as("w1"))
  }

  /** The aggregated SimHash derivation the expression replaced — kept as
    * the independent REFEREE for the parity spec (explode → 64 ±1-vote
    * sums per doc → word packing; shuffles every token occurrence). */
  private[graft] def simhashAggregated(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val voteExprs = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$i")
    }
    val votes = tok.groupBy("doc_id").agg(voteExprs.head, voteExprs.tail: _*)
    val word = (lo: Int) => (0 until 32).map { i =>
      when(col(s"v${lo + i}") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
    votes.select(col("doc_id"), word(0).as("w0"), word(32).as("w1"))
  }

  /** Duplicate-SPAN detection — exact substring dedup at token-window
    * granularity: every `w`-token window appearing in >1 distinct
    * document marks its token range [pos, pos+w) as duplicated, and
    * overlapping/adjacent ranges within a doc merge into maximal spans
    * (gaps-and-islands over start positions: break when the next start
    * clears the previous window entirely). The pass document-level
    * dedup can't see — shared boilerplate inside otherwise-distinct
    * docs. Hash-first: candidate grouping runs on xxhash64(window)
    * (16-byte shuffle rows), and only windows whose hash is cross-doc —
    * a tiny set — are re-grouped on the window TEXT, so a 2⁻⁶⁴
    * collision can't fabricate a span (the exact-dedup discipline).
    * Returns one row per affected doc: n_spans, dup_tokens, max_span,
    * dup_ratio. */
  /** Hash-prefiltered window candidates: every w-token window of every
    * doc whose xxhash64 collides cross-doc — (doc_id, n_tokens, pos,
    * win). The wide grouping runs on the 16-byte hash; only colliding
    * windows (a tiny set) survive carrying text, for collision-proof
    * re-verification downstream. */
  private def dupWindowCandidates(docs: DataFrame, w: Int): DataFrame = {
    val toks = graft.operators.Scale.fanOutScan(docs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    // sequence(0, n-w) is DESCENDING for n < w — filter short docs first
    val wins = toks.filter(size(col("toks")) >= w)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        posexplode(expr(
          s"transform(sequence(0, size(toks) - $w), " +
            s"i -> concat_ws(' ', slice(toks, i + 1, $w)))"))
          .as(Seq("pos", "win")))
      .select(col("doc_id"), col("n_tokens"), col("pos").cast("long").as("pos"),
        xxhash64(col("win")).as("h"), col("win"))
    val candH = wins.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select("h")
    wins.join(candH, Seq("h"), "left_semi")
      .select("doc_id", "n_tokens", "pos", "win")
  }

  /** Gaps-and-islands merge of window start positions into maximal
    * token intervals [s0, s1): break when the next start clears the
    * previous window entirely. Input (doc_id, n_tokens, pos). */
  private def mergeIslands(dupPos: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    dupPos
      .withColumn("prev", lag("pos", 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + w, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(first("n_tokens").as("n_tokens"),
        min("pos").as("s0"), (max("pos") + w).as("s1"))
  }

  def dupSpans(docs: DataFrame, w: Int): DataFrame = {
    // candidates are the tiny cross-doc-colliding subset; checkpoint so
    // the two consumers (dup-window census, position semi-join) don't
    // each replay the full window-explode pipeline (r15)
    val cand = dupWindowCandidates(docs, w).localCheckpoint()
    val dupWin = cand.groupBy("win")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select("win")
    val dupPos = cand.join(dupWin, Seq("win"), "left_semi")
      .select("doc_id", "n_tokens", "pos")
    mergeIslands(dupPos, w).groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("s1") - col("s0")).as("dup_tokens"),
        max(col("s1") - col("s0")).as("max_span"),
        round(sum(col("s1") - col("s0")) / first("n_tokens"), 4).as("dup_ratio"))
  }

  /** Duplicate-span EXCISION — the rewrite that deduplicates at span
    * granularity while keeping one canonical copy of every duplicated
    * substring: each cross-doc w-token window has a canonical occurrence
    * (global min (doc_id, pos)); in every HIGHER doc the window's token
    * range is removable, removable ranges merge into maximal intervals,
    * and the doc is reassembled from the surviving tokens. The canonical
    * doc keeps its text; a span whose windows are canonical in several
    * OTHER docs is excised wholly (its content existed earlier
    * elsewhere). Interval lists are per-doc-bounded, so the rewrite is a
    * per-row array filter — no token-level shuffle; only window
    * candidates shuffle, hash-first as everywhere. Returns (doc_id,
    * n_before, n_after, text_after) for every document. */
  def exciseDupSpans(docs: DataFrame, w: Int): DataFrame = {
    val toks = graft.operators.Scale.fanOutScan(docs)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    // same two-consumer checkpoint as [[dupSpans]] (r15)
    val cand = dupWindowCandidates(docs, w).localCheckpoint()
    val winStats = cand.groupBy("win")
      .agg(countDistinct(col("doc_id")).as("nd"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .filter(col("nd") > 1)
      .select(col("win"), col("canon.doc_id").as("canon_doc"))
    val removable = cand.join(winStats, Seq("win"))
      .filter(col("canon_doc") < col("doc_id"))
      .select("doc_id", "n_tokens", "pos")
    val ivs = mergeIslands(removable, w)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s0"), col("s1")))).as("ivs"))
    toks.join(ivs, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_before"),
        when(col("ivs").isNull, col("toks")).otherwise(
          filter(col("toks"), (_, i) =>
            !exists(col("ivs"), iv =>
              i >= iv.getField("s0") && i < iv.getField("s1"))))
          .as("kept"))
      .select(col("doc_id"), col("n_before"),
        size(col("kept")).cast("long").as("n_after"),
        concat_ws(" ", col("kept")).as("text_after"))
  }

  /** SimHash near-dup pairs: 4×16-bit band blocking on each word pair,
    * then hamming(bit_count(xor)) ≤ maxHamming verification. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sig = simhash(docs)
    // 4 bands = the four 16-bit halves of the two 32-bit words
    val buckets = sig.select(col("doc_id"), col("w0"), col("w1"),
      posexplode(array(
        col("w0").bitwiseAND(lit(0xFFFFL)),
        shiftrightunsigned(col("w0"), 16).bitwiseAND(lit(0xFFFFL)),
        col("w1").bitwiseAND(lit(0xFFFFL)),
        shiftrightunsigned(col("w1"), 16).bitwiseAND(lit(0xFFFFL))
      )).as(Seq("band", "bucket")))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.w0").as("a0"), col("x.w1").as("a1"),
              col("y.doc_id").as("b_id"), col("y.w0").as("b0"), col("y.w1").as("b1"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("a0").bitwiseXOR(col("b0"))) +
        bit_count(col("a1").bitwiseXOR(col("b1"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
