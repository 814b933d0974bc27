package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import Similarity.{dot, prepared}

/** IVF (inverted-file) approximate nearest neighbor: k-means-lite
  * centroids partition the corpus into cells; a query scans only its
  * `nprobe` nearest cells. The second scale path next to random-hyperplane
  * LSH ([[Similarity.lshTopK]]).
  *
  * The centroid table is k×dim — driver-sized by construction — so cell
  * assignment is a pure per-row EXPRESSION over inlined centroid
  * literals: no crossJoin, no shuffle, no window. Assigning 10⁹ vectors
  * is a narrow map stage; the only shuffle per Lloyd step is the
  * per-(cell,dim) mean. Deterministic given the data (seeded by first-k
  * init). */
object Ivf {

  private type Centroids = Array[(Int, Array[Double])]

  /** Nearest-centroid cell id (min d², cid tiebreak) — one
    * [[graft.functions.PqOps]] typed expression over a single centroid
    * literal (r15): the former per-centroid inlined-literal struct/dot
    * array cost seconds of driver-side Catalyst analysis per query.
    * Same d² = (emb² − 2·⟨emb,c⟩) + |c|² association order, same
    * lexicographic (d², cid) winner — still no grouping shuffle. */
  private def assignExpr(emb: Column, cents: Centroids): Column =
    graft.functions.PqOps.ivf_assign(emb, cents)

  private def collectCentroids(df: DataFrame): Centroids =
    df.collect().map { r =>
      (r.getInt(0), r.getSeq[Double](1).toArray)
    }

  /** First-k-by-id seeding — the naive baseline. Degrades on skewed
    * corpora: if the low ids all sit in one dense cluster, every seed
    * starts there and Lloyd steps rarely escape (cells collapse, distant
    * clusters share one cell, probe recall drops). Kept for the spec that
    * demonstrates exactly that against [[seedCentroids]]. */
  private def firstKSeeds(v: DataFrame, k: Int): Centroids =
    collectCentroids(
      v.orderBy("vec_id").limit(k)
        .select(col("vec_id").cast("int").as("cid"), col("emb").as("cvec")))

  /** kmeans‖-style oversampled seeding (the shape of Bahmani et al.,
    * VLDB'12), fully DETERMINISTIC — no RNG state:
    *
    *  1. seed point = min-id vector;
    *  2. ONE distributed pass computes each point's d² to that seed and
    *     Bernoulli-samples it with p = min(1, l·d²/Σd²), l = 4k, using
    *     U(id) = xxhash64(id)'s top 53 bits / 2⁵³ as the coin — expected
    *     ≈l survivors, collected (driver-sized by construction);
    *  3. driver-side maximin (farthest-point) reduce of the candidates to
    *     k — the deterministic stand-in for the kmeans++ weighted reduce —
    *     topped up from first-k ids if the sample ran short.
    *
    * Distance-weighted sampling puts seeds ∝ spread instead of ∝ id
    * order, so skewed corpora start with seeds in every cluster — which
    * is directly what probe recall depends on. Degenerate corpus
    * (Σd² = 0: all points identical) falls back to first-k. */
  private def seedCentroids(v: DataFrame, k: Int): Centroids = {
    val c0s = firstKSeeds(v, 1)
    // empty corpus: degrade like first-k always did (empty centroid set,
    // degenerate-but-defined results) instead of crashing at .head
    if (c0s.isEmpty) return c0s
    val c0 = c0s.head._2
    val c0Lit = array(c0.toIndexedSeq.map(lit): _*)
    val c0sq = c0.map(x => x * x).sum
    val withD2 = v.select(col("vec_id"), col("emb"),
      (dot(col("emb"), col("emb")) - lit(2.0) * dot(col("emb"), c0Lit) + lit(c0sq)).as("d2"))
    val total = withD2.agg(sum("d2")).head().getDouble(0)
    if (!(total > 0.0)) return firstKSeeds(v, k)
    val coin = shiftrightunsigned(xxhash64(col("vec_id")), 11).cast("double") /
      lit((1L << 53).toDouble)
    val sampled = withD2
      .filter(coin < least(lit(1.0), lit(4.0 * k) * col("d2") / lit(total)))
      .select("vec_id", "emb").collect()
      .sortBy(_.getLong(0))
      .map(r => r.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(c0)
    val pool = scala.collection.mutable.ArrayBuffer(sampled.toIndexedSeq: _*)
    while (chosen.size < k && pool.nonEmpty) {
      // farthest point from the chosen set (maximin); stable under ties
      // because the pool is id-ordered and `maxBy` keeps the first max
      val next = pool.maxBy(c => chosen.map(d2(c, _)).min)
      chosen += next
      pool -= next
    }
    if (chosen.size < k) {
      val have = chosen.map(_.toSeq).toSet
      firstKSeeds(v, k).iterator.map(_._2)
        .filterNot(c => have(c.toSeq))
        .take(k - chosen.size)
        .foreach(chosen += _)
    }
    chosen.zipWithIndex.map { case (cv, i) => (i, cv) }.toArray
  }

  /** (vec_id, emb, nrm, cid) assignments plus the centroid table
    * (cid, cvec). Init = kmeans‖-style seeding ([[seedCentroids]]);
    * `firstKSeed = true` selects the naive first-k-by-id baseline.
    * `iters` Lloyd steps.
    *
    * Each Lloyd step `collect`s the k×dim centroid table and restarts the
    * next step from local literals (what spark.ml KMeans does). Without
    * this the loop chains lazy plans and iteration i re-executes all of
    * 1..i-1; with it each step is exactly one job over `v`. */
  def index(vecs: DataFrame, k: Int, iters: Int,
            firstKSeed: Boolean = false): (DataFrame, DataFrame) = {
    val spark = vecs.sparkSession
    val v = prepared(vecs).select("vec_id", "emb", "nrm")
    // Lloyd steps run on a deterministic half-sample (seedless xxhash64 of
    // vec_id), the same rationale as Pq.train: centroid quality needs a
    // representative sample, not the corpus, and at 10⁹ vectors the
    // per-iteration pass is the training cost. ASSIGNMENT below still
    // covers every vector; IvfSpec's recall floors hold on the sampled
    // centroids.
    val vt = v.filter(pmod(xxhash64(col("vec_id")), lit(2L)) === 0L)
    var cents: Centroids =
      if (firstKSeed) firstKSeeds(vt, k) else seedCentroids(vt, k)
    for (_ <- 0 until iters) {
      cents = collectCentroids(
        vt.withColumn("cid", assignExpr(col("emb"), cents))
          .select(col("cid"), posexplode(col("emb")).as(Seq("dim", "x")))
          .groupBy("cid", "dim").agg(avg("x").as("m"))
          .groupBy("cid")
          .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
          .select(col("cid"), transform(col("pairs"), p => p.getField("m")).as("cvec")))
    }
    val assigned = v.withColumn("cid", assignExpr(col("emb"), cents))
    val centroidDf = spark.createDataFrame(
      java.util.Arrays.asList(cents.map { case (cid, cv) => Row(cid, cv.toSeq) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cvec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    (assigned, centroidDf)
  }

  /** Approximate cosine top-k: each query probes its `nprobe` nearest
    * cells and ranks only those cells' vectors. Probe cells come from the
    * same inlined-centroid expression (array_sort of (d2, cid) structs,
    * slice nprobe) — no crossJoin or window on the query side either. */
  def topK(vecs: DataFrame, queries: DataFrame, k: Int,
           nCells: Int = 16, nprobe: Int = 8, iters: Int = 2,
           firstKSeed: Boolean = false): DataFrame = {
    val (assigned, centroidDf) = index(vecs, nCells, iters, firstKSeed)
    probe(assigned, collectCentroids(centroidDf), queries, k, nprobe)
  }

  /** The probe phase alone: each query expands to its `nprobe` nearest
    * cells (same inlined-centroid expression — array_sort of (d2, cid)
    * structs, slice nprobe; no crossJoin or window on the query side),
    * joins the cell assignments, and ranks only those cells' vectors. */
  private def probe(assigned: DataFrame, cents: Centroids,
                    queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = prepared(queries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
      .withColumn("cid",
        explode(graft.functions.PqOps.ivf_probe(col("q_emb"), cents, nprobe)))
    val sims = assigned.join(q, Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(dot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6))
    sims.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("sim"))
  }

  /** Persist the index: cell assignments partitioned BY CELL (probing
    * nprobe of nCells cells then reads exactly that fraction of the
    * files — partition pruning does the work a specialized ANN index
    * file format would) plus the driver-sized centroid table. Build
    * once, probe every later query batch without re-clustering. */
  def writeIndex(vecs: DataFrame, path: String,
                 nCells: Int = 16, iters: Int = 2): Unit = {
    val (assigned, centroidDf) = index(vecs, nCells, iters)
    assigned.write.mode("overwrite").partitionBy("cid").parquet(s"$path/cells")
    centroidDf.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a persisted index. The nprobe cell ids per query come from
    * the (driver-sized, re-inlined) centroid table; the cells scan is
    * partition-pruned to the probed cells at planning/runtime. */
  def topKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nprobe: Int = 8): DataFrame = {
    val cents = collectCentroids(spark.read.parquet(s"$path/centroids"))
    val assigned = spark.read.parquet(s"$path/cells")
    probe(assigned, cents, queries, k, nprobe)
  }

  /** New vectors assigned to a persisted index's EXISTING centroids —
    * the same pure nearest-centroid expression the probe uses. */
  private def assignToIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, vecs: DataFrame): DataFrame = {
    val cents = collectCentroids(spark.read.parquet(s"$path/centroids"))
    require(cents.nonEmpty, s"no centroids at $path — writeIndex first")
    prepared(vecs).select("vec_id", "emb", "nrm")
      .withColumn("cid", assignExpr(col("emb"), cents))
  }

  /** INCREMENTAL APPEND — the daily-embedding-pipeline path (the
    * signature-store ingest pattern applied to ANN): assign the new
    * batch to the EXISTING centroids (pure per-row expression — no
    * re-clustering, no job over the old corpus) and append each vector
    * to its cell's partition. Probes see the appended vectors
    * immediately, and the result is IDENTICAL to re-assigning the whole
    * corpus at these centroids ([[rebuildCells]]; spec-pinned): append
    * changes nothing about where any existing vector lives.
    *
    * RECALL-DRIFT BOUND: the centroids are frozen, so probe recall over
    * appended data matches the original index exactly as long as the
    * appends come from the SAME distribution the centroids were trained
    * on — nearest-centroid assignment is distribution-free given the
    * centroids. What degrades under DRIFT is cell geometry: vectors from
    * an unseen mode all land in whichever existing cells are least-far
    * away, those cells bloat (probe cost grows with cell size), and a
    * query near the new mode finds its true neighbors spread across
    * cells its nprobe shortlist may miss. Operational rule: re-cluster
    * ([[writeIndex]]) when appended volume exceeds ~¼ of the indexed
    * corpus or max/median cell size exceeds ~4× — both driver-cheap to
    * monitor from the cells partition listing. Until then,
    * [[rebuildCells]] compacts append-accumulated small files without
    * re-clustering. Like [[writeIndex]], not crash-atomic — run appends
    * serially from the ingest job. */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    newVecs: DataFrame): Unit =
    assignToIndex(spark, path, newVecs)
      .write.mode("append").partitionBy("cid").parquet(s"$path/cells")

  /** Re-assign a corpus to the existing centroids and rewrite the cells
    * wholesale — compaction for an index that has taken many appends
    * (each append adds files per touched cell), without the re-cluster
    * cost. Assignment is the same expression [[appendToIndex]] uses, so
    * contents are unchanged when called on the indexed corpus. */
  def rebuildCells(spark: org.apache.spark.sql.SparkSession, path: String,
                   vecs: DataFrame): Unit =
    assignToIndex(spark, path, vecs)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/cells")
}
