package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search over an Array[Float] column.
  *
  * Two paths, per the scale story:
  *  - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set
  *    against the full corpus; per-row dot products, one TakeOrdered per
  *    query. Right answer for ≤ millions of vectors or as the re-rank
  *    stage.
  *  - [[lshTopK]]: random-hyperplane LSH — bucket both sides on sign-bit
  *    signatures, search only same-bucket candidates. The equality-join
  *    shape that survives 100 TB; recall traded via number of planes.
  *
  * Dot products use zip_with + aggregate over double-cast values:
  * left-to-right summation, bit-identical to the DuckDB oracle's
  * list_transform/list_sum evaluation.
  */
object Similarity {

  /** Sequential-order dot product of two array<double> columns — native
    * codegen'd Catalyst expression (graft.functions.DotProduct); same
    * left-to-right accumulation as the DuckDB oracle's list_sum. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Adds emb (array<double>) + nrm columns. */
  def prepared(vecs: DataFrame): DataFrame =
    vecs.withColumn("emb", col("embedding").cast("array<double>"))
      .withColumn("nrm", l2norm(col("emb")))

  /** Exact cosine top-k: queries × corpus with the query side broadcast.
    * Rounded similarity (6dp) before ranking so cross-engine float noise
    * can't reorder ties; vec_id is the deterministic tiebreak. */
  def bruteTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = prepared(vecs)
    val q = prepared(queries).select(
      col("vec_id").as("q_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    val sims = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(dot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("sim"))
  }

  /** Int8-quantized exact top-k — the MEMORY-scale path for brute-force
    * re-ranking at 100 TB: each vector is stored as 127-scaled signed
    * small ints of its unit-normalized form (4× smaller than float32;
    * the production layout packs them into a BinaryType column, one byte
    * per dim), and similarity ranks by the INTEGER dot product of the
    * quantized vectors — after quantization there is no float compare
    * anywhere, so the ranking is bit-stable on any engine and any
    * partition-merge order. Quantization `floor(127·xᵢ/‖x‖ + 0.5)` is
    * itself deterministic cross-engine: ×, ÷, sqrt are IEEE
    * correctly-rounded and the norm's summation order matches the
    * oracle's sequential list_sum (the [[dot]] contract). Same broadcast
    * + partial-WindowGroupLimit plan as [[bruteTopK]]; the corpus side
    * carries dim bytes/row instead of 4·dim. */
  def quantizedTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def quant(df: DataFrame): DataFrame =
      prepared(df).withColumn("qvec",
        transform(col("emb"),
          x => floor(x * lit(127.0) / col("nrm") + lit(0.5))))
    val c = quant(vecs).select(col("vec_id"), col("qvec"))
    val q = quant(queries).select(
      col("vec_id").as("q_id"), col("qvec").as("q_qvec"))
    val sims = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dot_q",
        aggregate(zip_with(col("qvec"), col("q_qvec"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
    val w = Window.partitionBy("q_id").orderBy(desc("dot_q"), asc("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("dot_q"))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * splitmix-style avalanche to a uniform in [-1, 1). Computed ON THE
    * DRIVER and inlined as literals — no RNG state, reproducible across
    * executors, and zero per-row hash work. */
  private def planeWeight(plane: Int, dim: Int): Double = {
    var h = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    (java.lang.Math.floorMod(h, 2000L).toDouble / 1000.0) - 1.0
  }

  /** Literal weight array for one hyperplane. */
  private def planeLit(plane: Int, dim: Int): Column =
    array((0 until dim).map(i => lit(planeWeight(plane, i))): _*)

  /** Sign-bit LSH bucket id from `planes` random hyperplanes over a
    * `dim`-dimensional embedding. Each projection is the codegen'd
    * [[dot]] against a literal weight array — a fused multiply-add loop
    * per plane, versus the per-element hash + lambda evaluation a
    * column-derived weight would cost. `salt` selects an independent
    * plane set (hash table). */
  def lshBucket(emb: Column, planes: Int, dim: Int, salt: Int = 0): Column =
    (0 until planes).map { p =>
      when(dot(emb, planeLit(salt * 1009 + p, dim)) > 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce((a, b) => a + b)

  /** Multi-probe bucket list for the QUERY side (Lv et al., VLDB'07): the
    * base bucket plus `probes − 1` neighbors obtained by flipping the
    * bits whose hyperplane projections have the smallest |margin| — the
    * buckets a near neighbor most likely fell into when it landed just
    * across a plane. Probing T buckets buys the recall of T hash tables
    * for ONE table's index memory and build cost; only the (small) query
    * side fans out. Returns an array<long> of `probes` distinct buckets. */
  def lshProbeBuckets(emb: Column, planes: Int, dim: Int, probes: Int,
                      salt: Int = 0): Column = {
    require(probes >= 1 && probes <= planes + 1,
      s"probes must be in [1, planes+1] = [1, ${planes + 1}] " +
        s"(each extra probe flips one distinct plane bit); got $probes")
    val projs = array((0 until planes).map(p =>
      dot(emb, planeLit(salt * 1009 + p, dim))): _*)
    val idx = sequence(lit(0), lit(planes - 1))
    val base = aggregate(
      zip_with(projs, idx, (pj, i) =>
        when(pj > 0, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
    // plane indices ordered by |projection| ascending — flip order
    val order = array_sort(zip_with(projs, idx,
      (pj, i) => struct(abs(pj).as("m"), i.as("i"))))
    val buckets = (0 until probes).map { j =>
      if (j == 0) base
      else base.bitwiseXOR(
        pow(lit(2.0), element_at(order, j).getField("i")).cast("long"))
    }
    array(buckets: _*)
  }

  /** Embedding width, from one row (a single tiny job — the corpus
    * schema doesn't carry the array length; all rows are assumed to
    * share it, as the fixed-width dot products already require). An
    * empty corpus yields dim 0 — every downstream result is empty
    * anyway, so no row to misread. */
  private def embDim(vecs: DataFrame): Int =
    vecs.select(size(col("embedding"))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Approximate cosine top-k: candidates restricted to the query's LSH
    * bucket, multi-probed — each query also searches the `probes − 1`
    * neighboring buckets across its smallest-margin hyperplanes. Fewer
    * planes → bigger buckets → higher recall, more work; more probes →
    * higher recall at the cost of probes× candidate fan-out on the query
    * side only (the corpus index is untouched). */
  def lshTopK(vecs: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 4, probes: Int = 2): DataFrame = {
    val dim = embDim(vecs)
    val c = prepared(vecs).withColumn("bucket", lshBucket(col("emb"), planes, dim))
    val q = prepared(queries)
      .withColumn("bucket",
        explode(lshProbeBuckets(col("emb"), planes, dim, probes)))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket"))
    val sims = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(dot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("sim"))
  }

  /** Embedding near-dup pairs: all pairs with cosine ≥ threshold. Brute
    * O(n²) self-join — the SPEC-SIDE REFEREE for [[cosinePairsLsh]], not a
    * query path: at corpus scale the broadcast nested-loop is a
    * non-starter. */
  def cosinePairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val v = prepared(vecs)
    val a = v.select(col("vec_id").as("a_id"), col("emb").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("b_id"), col("emb").as("eb"), col("nrm").as("nb"))
    // raw prefilter before the 6dp round: round() on a double costs a
    // BigDecimal round-trip through Double.toString (~µs) — gate the
    // all-pairs stream on the cheap raw compare first. Any x with
    // round(x,6) ≥ t has x ≥ t − 5×10⁻⁷, so t − 10⁻⁶ keeps every
    // survivor (slack ≫ double repr error); the rounded filter stays
    // as the semantic gate.
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("rawsim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("rawsim") >= threshold - 1e-6)
      .withColumn("sim", round(col("rawsim"), 6))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** Embedding near-dup pairs, LSH-bucketed — the 100 TB path replacing
    * the all-pairs join: candidates are same-bucket pairs under `tables`
    * independent `planes`-bit random-hyperplane signatures (OR-amplified
    * recall: a pair at cosine s collides in one table with probability
    * (1 − θ(s)/π)^planes, misses all tables with (1−p)^tables), verified
    * by EXACT cosine — so precision is exact and only candidate
    * generation is approximate. Every join is an equality join on (table,
    * bucket) or vec_id; the corpus is never broadcast and never
    * self-joined without a bucket key.
    *
    * Recall is a real trade only near the decision boundary: random
    * hyperplanes separate well for genuinely-near pairs (cosine ≳ 0.8,
    * θ ≲ 37°) and cannot separate near-orthogonal pairs (cosine ~0.3 is
    * θ ~72°, barely off random) — thresholds that low need the brute
    * referee. Defaults sized for near-dup thresholds. */
  def cosinePairsLsh(vecs: DataFrame, threshold: Double,
                     planes: Int = 8, tables: Int = 4): DataFrame = {
    val dim = embDim(vecs)
    val v = prepared(vecs)
    val buckets = v.select(col("vec_id"),
      posexplode(array((0 until tables).map(t =>
        lshBucket(col("emb"), planes, dim, salt = t + 1)): _*)).as(Seq("tbl", "bucket")))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("tbl", "bucket"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
    val a = v.select(col("vec_id").as("a_id"), col("emb").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("b_id"), col("emb").as("eb"), col("nrm").as("nb"))
    cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("sim", round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** Deterministic near-duplicate injection for the embedding corpus: for
    * every even vec_id, adds a copy (id + 100000) with each component
    * scaled by 1 + ((vec_id·31 + i·7) mod 11 − 5)·0.004 — a ±2%
    * perturbation keeping cosine(original, copy) ≈ 0.9998 while all
    * cross-pairs stay below ~0.52 on this corpus. Pure integer + IEEE
    * double arithmetic so the DuckDB oracle reproduces it bit-exactly. */
  def withPlantedDups(vecs: DataFrame): DataFrame = {
    val base = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pert = base.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + ((col("vec_id") * 31 + i * 7) % 11 - 5).cast("double") * lit(0.004)))
          .as("embedding"))
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    base.unionByName(pert)
  }
}
