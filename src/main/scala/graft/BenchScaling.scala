package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scaling-curve measurement: time the HEAVY operators (dedup, ANN,
  * curation, decontamination — the 100 TB-relevant paths) at two scale
  * factors a 10× data step apart and report per-query wall-time ratios.
  * Converts the repo's "this plan scales ~linearly" claims (PLANS.md,
  * PlanSpec) from plan-audit into measurement: a query whose time grows
  * much faster than the data step has a super-linear stage a plan
  * inspection missed.
  *
  * Methodology mirrors [[Bench]] (noop-write materialization = full
  * physical plan, no sink I/O), with a full warm-up pass at the smallest
  * scale factor first so JIT/codegen/footer-cache cold starts don't
  * inflate the small-sf numbers (which would *understate* the ratios).
  * Output: one JSON line on stdout + `target/bench_scaling.json`.
  */
object BenchScaling {
  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** The scale-relevant subset: every dedup/similarity/curation path
    * plus the two decontamination variants. Cheap relational queries are
    * excluded — at these scale factors they are fixed-overhead-dominated
    * and their ratios would measure scheduling, not the operator. */
  private val heavy = Seq(
    "q_dedup_exact", "q_dedup_jaccard", "q_dedup_clusters",
    "q_dedup_minhash", "q_dedup_simhash", "q_dedup_incremental",
    "q_dedup_embed", "q_knn_brute", "q_knn_lsh", "q_knn_ivf",
    "q_decontam", "q_decontam_bloom", "q_curation", "q_curate_full",
    "q_fingerprint", "q_token_topk",
    "q_heavy_hitters", "q_doc_perplexity", "q_contam_overlap",
    "q_chunking", "q_embed_centroids",
    // r6: the sort-based exact-percentile rewrite (the scale claim is the
    // whole point of the rewrite), corpus-global TF-IDF statistics, and
    // paragraph-level dedup (content-keyed shuffles over exploded text)
    "q_percentiles", "q_tfidf", "q_para_dedup",
    // r6b: iterative graph PageRank (per-iteration |V| shuffle against a
    // once-partitioned edge list), the two-sort-pass MAD robust stats,
    // the per-char fingerprint checksum fold, and the weighted-median
    // cumulative-weight window
    "q_pagerank", "q_robust_mad", "q_table_checksum", "q_weighted_median",
    // r6c: the per-order pair self-join (bounded pair explosion is the
    // scale claim) and the user-keyed sequence window under the
    // transition matrix
    "q_basket_pairs", "q_markov_transitions",
    // r6d: token-window duplicate spans (W× explode + hash-first
    // candidate shuffle), SemDeDup's within-cluster quadratic, the
    // cluster-keyed leakage-free split (closure + per-row hash), and the
    // PQ pipeline (codebook training shuffles + narrow ADC scan)
    "q_dup_spans", "q_semdedup", "q_leakage_split", "q_knn_pq",
    // r7b: directional containment (the inverted-index join cost under
    // the asymmetric denominator), CDC chunking (per-char rolling-hash
    // expression + md5 census), first-occurrence novelty (shingle-keyed
    // global map + join-back), and the PCA sufficient-statistic pass
    // (d² per-row products into a d²-key hash-agg)
    "q_containment", "q_cdc_chunks", "q_ngram_novelty", "q_pca_project",
    // r7c-g: the blocked Jaro-Winkler self-join (Σ|block|² kernel
    // evals), the three-rank RFM pass (denseIds ×3 over the user dim),
    // the bucketed-write + co-located-join round trip (layout write
    // amortization), and the Poisson-bootstrap explode (R× lightweight
    // rows into a partial agg)
    "q_record_linkage", "q_rfm_segments", "q_bucketed_join", "q_bootstrap_ci",
    // r7n-r7x: star-contraction connected components and k-core peeling
    // (per-round |V|/|E| shuffles, O(log) rounds), the recursive-CTE BOM
    // walk (per-level join against the once-read edge table), VARIANT
    // parse+extract (per-row semi-structured decode into a hash-agg),
    // the grid-bucketed spatial radius join (3×3-cell equi-join fan-out),
    // and the four Structured Streaming paths (fixed micro-batch
    // machinery + watermark-bounded state — the ratio certifies state
    // eviction, not throughput)
    "q_cc_bigstar", "q_kcore", "q_recursive_cte", "q_variant_extract",
    "q_grid_radius_join", "q_stream_window", "q_stream_sessions",
    "q_stream_join", "q_stream_first_touch",
    // r8 tail: the oriented triangle chain + corner explode (wedge
    // volume is the scale claim) and the double rank-window pass over
    // the full fact table (two external sorts + a moment reduce)
    "q_clustering_coeff", "q_spearman",
    // r9: the rest of the r8 web-ingest + statistics batch that does
    // data-sized work — URL canonicalization and HTML→text extraction
    // (codegen'd regex chains in the scan), license/code detection
    // (same class), mirror detection (two-sided content-hash join),
    // the docs-per-domain cap (spillable window + partial top-k), the
    // 14-moment one-pass correlation matrix, PSI drift (binned census
    // vs baseline), nested-JSON array flattening (VariantGet explode),
    // and the md5-seeded weighted sampler (per-row digest + top-k)
    "q_url_canonical", "q_html_extract", "q_license_filter",
    "q_code_detect", "q_mirror_detect", "q_domain_cap", "q_corr_matrix",
    "q_psi", "q_json_flatten", "q_weighted_sample",
    // r9 additions with data-sized or iterative work: the portable HLL
    // sketch agg (md5 per row), the bounded-fan-out trailing-distinct
    // join, iterative BFS, the md5-octet bootstrap draw, and the
    // shingle-checkpoint jaccard consumers' new baseline keeper
    "q_hll_portable", "q_window_distinct", "q_bfs_layers",
    "q_classifier_eval", "q_cdc_merge", "q_stratified_split",
    // r9 tail batches: the explode-heavy text ops and the itemset join
    "q_itemset3", "q_naive_bayes", "q_burrows_delta", "q_char_trigrams",
    "q_kruskal_wallis", "q_cvm_test")

  def main(args: Array[String]): Unit = {
    // trailing names restrict the run (same contract as Verify/Bench)
    val only: Set[String] = args.toSet
    val measured = if (only.isEmpty) heavy else heavy.filter(only)
    val smallDir = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val bigDir = sys.env.getOrElse("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_SF_WARM", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // partitions ∝ data, like a real cluster (see Bench's r12 note): the
    // decade RATIO should compare two well-configured runs, not charge the
    // big SF for sort depth a production deployment would never pin
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pass(dir: String): Map[String, Either[String, Double]] =
      measured.map { name =>
        // same measurement hygiene as Bench: collect the previous query's
        // garbage OUTSIDE this query's timing window
        System.gc()
        val t0 = System.nanoTime()
        // registry lookup inside the try: a renamed/removed query must
        // land in its own err entry, not abort the whole run's output
        val r = try {
          materialize(SparkEntry.queries(name)(spark, dir))
          Right((System.nanoTime() - t0) / 1e9)
        } catch { case t: Throwable => Left(BenchUtil.errString(t)) }
        name -> r
      }.toMap

    pass(warmDir): Unit // warm-up: JIT + codegen + class loading
    val small = pass(smallDir)
    val big = pass(bigDir)
    val entries = measured.map { name =>
      (small(name), big(name)) match {
        case (Right(s), Right(b)) =>
          // ratio only when finite: a 0-second small_sec would emit a
          // bare NaN/Infinity token, which is not valid JSON
          val ratio = if (s > 0 && (b / s).isFinite) f""","ratio":${b / s}%.2f"""
                      else ""
          f""""$name":{"small_sec":$s%.3f,"big_sec":$b%.3f$ratio}"""
        case (s, b) =>
          val err = Seq(s.left.toOption.map("small: " + _),
            b.left.toOption.map("big: " + _)).flatten.mkString("; ")
          s""""$name":{"err":"$err"}"""
      }
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"scaling","small":"$smallDir","big":"$bigDir","data_step":10.0,"queries":$entries,"materialization":"noop-write"}"""
    println(json)
    // restricted runs are for iteration — don't clobber the full-run
    // artifact with a partial query map
    if (only.isEmpty) {
      val out = java.nio.file.Paths.get("target/bench_scaling.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8")): Unit
    }
    spark.stop()
  }
}
