package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Similarity.{dot, prepared}

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-compression path
  * for billion-vector ANN: split each d-dim vector into `m` subvectors,
  * vector-quantize each subspace against its own `ksub`-codeword
  * codebook, and store only the m code ids. Here the whole code packs
  * into ONE 64-bit long (m·log₂ksub ≤ 64 — the default 8×16 uses 32
  * bits), so a 64-dim float vector (256 B) becomes an 8 B column: at
  * 10⁹ vectors the corpus drops from 256 GB to 8 GB and the ADC scan
  * reads a single long column — no embedding bytes touched until the
  * exact re-rank of a driver-bounded shortlist.
  *
  * Every stage is Spark-native and shuffle-lean:
  *  - training runs ALL m subspace k-means in one shuffle per Lloyd
  *    iteration (explode to (subspace, code, dim) — m·ksub·dsub groups,
  *    map-side combinable, centroids driver-sized);
  *  - encoding is a pure narrow expression (inlined codebook literals,
  *    argmin over (d², code) structs — the [[Ivf]] assignment idiom);
  *  - ADC (asymmetric distance computation) inlines each query's
  *    lookup table as an array literal indexed by the unpacked code
  *    nibble — a narrow scan, no join, no shuffle;
  *  - only the top-`rerank` shortlist per query shuffles (WindowGroupLimit
  *    keeps `rerank` rows per task), then exact cosine re-ranks it.
  *
  * Approximation error lives ONLY in shortlist membership (like
  * [[Ivf]]'s probe): reported similarities are exact. */
object Pq {

  /** codebooks(j)(c) = the dsub-dim codeword c of subspace j. */
  type Codebooks = Array[Array[Array[Double]]]

  /** Per-subspace argmin codes, packed — one [[graft.functions.PqOps]]
    * typed expression over a single codebook literal (r15): the former
    * per-codeword inlined-literal struct/dot subtrees cost seconds of
    * driver-side Catalyst analysis per query (ProfileQuery, sf0.1). d²
    * ordering drops the constant |sub|² term (argmin over c of
    * −2·⟨sub,c⟩+|c|² — fewer float ops, same winner); ties break to the
    * lower code. Identical arithmetic and tie order to the replaced
    * array_min formulation (PqSpec parity holds). */
  private def packedCodes(emb: Column, books: Codebooks, bits: Int): Column =
    graft.functions.PqOps.pq_encode(emb, books, bits)

  /** Train the m per-subspace codebooks: first-ksub-by-id seeding, then
    * `iters` Lloyd steps — each step assigns all m codes per row in one
    * narrow projection and computes every (subspace, code, dim) mean in
    * ONE shuffle. Codebooks are driver-sized (m·ksub·dsub doubles).
    *
    * Training runs on a DETERMINISTIC BOUNDED sample (seedless xxhash64
    * of vec_id thresholded to target ~`trainTarget` rows — stable
    * across runs and engines): codebook quality needs a representative
    * sample, not the corpus (Jégou trains 10⁶-vector codebooks from
    * 10⁵ samples), and at 10⁹ vectors a full-corpus Lloyd pass per
    * iteration is pure waste. r14 (VERDICT r13 task 2): the former
    * constant HALF-sample kept per-iteration training work linear in
    * corpus size; the hash threshold is now ∝ target/corpus-count, so
    * the training set is ~10⁵ rows no matter the corpus — "only
    * training scales down" is delivered, at the price of one up-front
    * count() (a column-pruned scan, amortized over the Lloyd
    * aggregations it shrinks). Corpora at or under the target train on
    * everything. ENCODING still covers every vector. PqSpec's
    * recall and quantization-error bounds hold on the bounded-sample
    * codebooks; A/B at sf0.1 in PLANS.md r14. */
  def train(vecs: DataFrame, m: Int = 8, ksub: Int = 16,
            iters: Int = 2, trainTarget: Long = 100000L): Codebooks = {
    val allV = prepared(vecs).select(col("vec_id"), col("emb"))
    // one fused job for (count, dim) — formerly a count() plus a separate
    // size() head, two sequential driver actions per train call (r15)
    val statRow = allV.agg(count(lit(1)), first(size(col("emb")))).head()
    val total = statRow.getLong(0)
    // hash-threshold sampling: keep vec_id iff pmod(hash, 2^20) < keep,
    // keep = ceil(2^20 · target/total) — expected sample size ≈ target,
    // deterministic membership (no RNG, no sampleBy), one narrow filter
    val Buckets = 1L << 20
    val keep =
      if (total <= trainTarget) Buckets
      else (Buckets * trainTarget + total - 1) / total
    val v =
      if (keep >= Buckets) allV
      else allV.filter(pmod(xxhash64(col("vec_id")), lit(Buckets)) < lit(keep))
    // fail fast on an empty training set (dim=0 would pass the
    // divisibility check and defer to an obscure downstream error)
    require(total > 0, "empty training set")
    val dim = statRow.getInt(1)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val seeds = v.orderBy("vec_id").limit(ksub)
      .select("emb").collect().map(_.getSeq[Double](0).toArray)
    require(seeds.length == ksub, s"corpus smaller than ksub=$ksub")
    var books: Codebooks = Array.tabulate(m) { j =>
      seeds.map(_.slice(j * dsub, (j + 1) * dsub))
    }
    val bits = bitsFor(ksub)
    val mask = (1L << bits) - 1
    for (_ <- 0 until iters) {
      // pc materialized as its own projection so the non-cheap encode
      // expression is evaluated ONCE per row (CollapseProject keeps
      // non-cheap aliases un-inlined); the m shift/mask extracts are free
      val means = v.select(col("emb"),
          packedCodes(col("emb"), books, bits).as("pc"))
        .select(col("emb"), posexplode(array((0 until m).map(j =>
          shiftright(col("pc"), j * bits).bitwiseAND(lit(mask)).cast("int")): _*))
          .as(Seq("j", "code")))
        .select(col("j"), col("code"),
          posexplode(slice(col("emb"), col("j") * dsub + 1, lit(dsub)))
            .as(Seq("dim", "x")))
        .groupBy("j", "code", "dim").agg(avg("x").as("mu"))
        .collect()
      val next = books.map(_.map(_.clone))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      } // codes with no members keep their previous codeword
      books = next
    }
    books
  }

  private def bitsFor(ksub: Int): Int = {
    val b = 32 - Integer.numberOfLeadingZeros(ksub - 1)
    math.max(b, 1)
  }

  /** Pack the m argmin codes into one long: code_j lives at bit j·bits.
    * The 8 B/vector representation the ADC scan reads. */
  def encode(vecs: DataFrame, books: Codebooks): DataFrame = {
    val m = books.length
    val ksub = books(0).length
    val bits = bitsFor(ksub)
    require(m * bits <= 64, s"$m×$bits-bit codes exceed one long")
    prepared(vecs).select(col("vec_id"), col("emb"), col("nrm"),
      packedCodes(col("emb"), books, bits).as("pq_code"))
  }

  /** Per-subspace squared-distance lookup tables for one query vector —
    * the DRIVER-side arithmetic is unchanged from the former inlined
    * form; the tables now ride one literal into the
    * [[graft.functions.PqOps.pq_lut_sum]] expression (same ascending-j
    * left-fold sum, same nibble indexing). */
  private def queryLuts(q: Array[Double], books: Codebooks): Array[Array[Double]] = {
    val dsub = books(0)(0).length
    books.zipWithIndex.map { case (book, j) =>
      val qsub = q.slice(j * dsub, (j + 1) * dsub)
      book.map { cv =>
        cv.zip(qsub).map { case (c, x) => (c - x) * (c - x) }.sum
      }
    }
  }

  /** Shared tail: keep the `rerank` best ADC candidates per query
    * (WindowGroupLimit bounds per-task state), then exact-cosine
    * re-rank against the broadcast query vectors — reported sims are
    * exact; only shortlist membership is approximate. */
  private def rerankTail(scored: DataFrame, queries: DataFrame,
                         k: Int, rerank: Int): DataFrame = {
    val short = scored
      .withColumn("r", row_number().over(
        Window.partitionBy("q_id").orderBy(asc("adc"), asc("vec_id"))))
      .filter(col("r") <= rerank)
    val qDf = broadcast(prepared(queries).select(col("vec_id").as("q_id"),
      col("emb").as("q_emb"), col("nrm").as("q_nrm")))
    short.join(qDf, "q_id")
      .withColumn("sim",
        round(dot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("sim"))
  }

  /** Approximate top-k: ADC shortlist of `rerank` candidates per query
    * (scored from the packed code alone), exact-cosine re-rank to k.
    * Queries collect to the driver (query-side-only fan-out, as in
    * [[Similarity.lshTopK]]); each query's m·ksub lookup table inlines
    * as array literals indexed by code nibbles. Output matches the other
    * kNN paths: (q_id, rank, n_id, sim) with EXACT sims. */
  def adcTopK(vecs: DataFrame, queries: DataFrame, k: Int,
              m: Int = 8, ksub: Int = 16, iters: Int = 2,
              rerank: Int = 50, trainTarget: Long = 100000L): DataFrame = {
    val books = train(vecs, m, ksub, iters, trainTarget)
    val bits = bitsFor(ksub)
    val enc = encode(vecs, books)
    val qRows = prepared(queries).select(col("vec_id"), col("emb"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qRows.nonEmpty, "no query vectors")
    val scored = enc.select(col("vec_id"), col("emb"), col("nrm"),
      explode(array(qRows.toIndexedSeq.map { case (qid, q) =>
        struct(lit(qid).as("q_id"),
          graft.functions.PqOps.pq_lut_sum(col("pq_code"),
            queryLuts(q, books), bits).as("adc"))
      }: _*)).as("qs"))
      .select(col("vec_id"), col("emb"), col("nrm"),
        col("qs.q_id").as("q_id"), col("qs.adc").as("adc"))
      .filter(col("vec_id") =!= col("q_id"))
    rerankTail(scored, queries, k, rerank)
  }

  /** IVF-PQ — the billion-scale composition (coarse inverted cells ×
    * residual product codes, the FAISS `IVFx,PQy` layout): [[Ivf.index]]
    * partitions the corpus into cells; each vector PQ-encodes its
    * RESIDUAL from its cell centroid (residuals are tighter around the
    * codebooks than raw vectors, and ‖v−q‖ = ‖r_v−r_q‖ exactly when both
    * subtract the same cell centroid — only the quantization of r_v is
    * approximate); each query probes its `nprobe` nearest cells with a
    * PER-CELL residual lookup table. The ADC scan stays narrow: a
    * when-chain on the cell id selects the probed cell's LUT, unprobed
    * cells score null and drop — pruning plus compression in one pass,
    * no join, no shuffle until the `rerank`-bounded shortlist. */
  def ivfPqTopK(vecs: DataFrame, queries: DataFrame, k: Int,
                nCells: Int = 16, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 16,
                ivfIters: Int = 2, pqIters: Int = 2,
                rerank: Int = 50): DataFrame = {
    val (assigned, centroidDf) = Ivf.index(vecs, nCells, ivfIters)
    val cents: Array[(Int, Array[Double])] = centroidDf.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    require(cents.nonEmpty, "empty centroid table")
    // one map LITERAL (typedlit) instead of a per-row CreateMap over
    // k×dim inlined component literals (r15 — the CreateMap tree was
    // re-analyzed per query and rebuilt per row before constant folding)
    val centMapLit = typedlit(cents.map { case (cid, cv) => (cid, cv.toSeq) }.toMap)
    val withRes = assigned.withColumn("res",
      zip_with(col("emb"), element_at(centMapLit, col("cid")), (a, b) => a - b))
    val books = train(
      withRes.select(col("vec_id"), col("res").as("embedding")), m, ksub, pqIters)
    val bits = bitsFor(ksub)
    val enc = withRes.withColumn("pq_code",
        packedCodes(col("res"), books, bits))
      .select("vec_id", "emb", "nrm", "cid", "pq_code")
    val qRows = prepared(queries).select(col("vec_id"), col("emb"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qRows.nonEmpty, "no query vectors")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def adcExpr(q: Array[Double]): Column = {
      val probed = cents.map { case (cid, cv) => (d2(q, cv), cid) }
        .sortBy(x => (x._1, x._2)).take(nprobe)
      probed.foldLeft(null: Column) { case (acc, (_, cid)) =>
        val cv = cents.find(_._1 == cid).get._2
        val qres = q.indices.map(i => q(i) - cv(i)).toArray
        val e = graft.functions.PqOps.pq_lut_sum(col("pq_code"),
          queryLuts(qres, books), bits)
        if (acc == null) when(col("cid") === cid, e)
        else acc.when(col("cid") === cid, e)
      }
    }
    val scored = enc.select(col("vec_id"), col("emb"), col("nrm"),
      explode(array(qRows.toIndexedSeq.map { case (qid, q) =>
        struct(lit(qid).as("q_id"), adcExpr(q).as("adc"))
      }: _*)).as("qs"))
      .select(col("vec_id"), col("emb"), col("nrm"),
        col("qs.q_id").as("q_id"), col("qs.adc").as("adc"))
      .filter(col("adc").isNotNull && col("vec_id") =!= col("q_id"))
    rerankTail(scored, queries, k, rerank)
  }
}
