package graft

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the 100 TB checklist (builder prompt /
  * SURVEY.md §4): filters and projections reach the parquet scan, small
  * dims broadcast, top-k plans as TakeOrderedAndProject (no global sort
  * materialization), hot paths stay inside WholeStageCodegen. */
class PlanSpec extends AnyFunSuite with SharedSpark {

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q_filter_eq: predicate pushed to parquet scan, schema pruned") {
    val p = planString("q_filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"), p)
    assert(p.contains("ReadSchema") && !p.contains("o_orderpriority"), "unused column not pruned")
  }

  test("q_project: only 4 of 11 lineitem columns read") {
    val p = planString("q_project")
    assert(!p.contains("l_shipdate") && !p.contains("l_returnflag"),
      "projection pruning failed:\n" + p)
  }

  test("q_star_join: dims broadcast, fact join shuffles only once") {
    val p = planString("q_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
    // lineitem⋈orders is the single shuffle join (sort-merge or shuffled hash)
    val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size
    assert(shuffleJoins <= 1, s"expected ≤1 shuffle join, got $shuffleJoins\n$p")
  }

  test("q_topk_metric: TakeOrderedAndProject, not a global sort") {
    val p = planString("q_topk_metric")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1_agg: partial aggregation before the exchange") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // HashAggregate(partial) below Exchange, final above
    val firstAgg = p.indexOf("HashAggregate")
    val exch = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exch >= 0, p)
    assert(p.contains("partial_"), "no partial (map-side) aggregation:\n" + p)
  }

  test("q_knn_brute: native dot_product + top-k pushed into WindowGroupLimit") {
    val p = planString("q_knn_brute")
    assert(p.contains("dot_product"), p)
    // rank<=k is executed as partial+final WindowGroupLimit, so each
    // partition keeps only k rows before the exchange — no full sort of
    // the n_queries × corpus similarity table
    assert(p.contains("WindowGroupLimit"), p)
    // codegen integration is verified separately (debugCodegen shows the
    // fused multiply-add loop inside WholeStageCodegen; AQE hides the
    // codegen markers in the pre-execution plan string)
  }

  test("q_sample_fixed_n: rank<=n plans as WindowGroupLimit, not full-stratum sort") {
    // each task must keep <= n rows per stratum BEFORE the lang
    // exchange; without the partial WindowGroupLimit the whole stratum
    // funnels through one post-shuffle window task
    val p = planString("q_sample_fixed_n")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_diversity_select: both quota ranks push into WindowGroupLimit") {
    // the (lang,source) cap and the per-lang selection are each a
    // rank<=k filter — both must plan as partial WindowGroupLimit so no
    // task ever sorts more than k rows per group past its own input
    val p = planString("q_diversity_select")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("q_percentiles: sort-based plan, no ObjectHashAggregate value buffer") {
    // exact percentile via `percentile`/`median` aggregates plans an
    // ObjectHashAggregate that buffers EVERY group value in executor
    // memory — the one plan shape that can't survive a 100× scale-up.
    // The sort-based rewrite must keep the whole plan spillable:
    // row_number is a running-frame window over an external sort.
    val p = planString("q_percentiles")
    assert(!p.contains("ObjectHashAggregate"),
      "exact percentile must not buffer group values in memory:\n" + p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "expected the sort-based window selection:\n" + p)
  }

  test("q_lateral_join: correlated LIMIT decorrelates to WindowGroupLimit, no re-scan") {
    // the per-nation top-2 subquery must NOT execute once per outer row:
    // Spark decorrelates it into a window top-n (partial WindowGroupLimit
    // keeps <= 2 rows per nation per task before the exchange) joined
    // broadcast to the outer side
    val p = planString("q_lateral_join")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_multi_join: date filter pushed, tiny dims broadcast") {
    val p = planString("q_multi_join")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      "date band not pushed to orders scan:\n" + p)
    // region + nation at minimum arrive via broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q_tpch_q5: all four dims broadcast, at most one fact-sized shuffle join") {
    // customer/supplier/nation/region must all arrive via broadcast; the
    // only join allowed to exchange fact-sized data is orders⋈lineitem
    val p = planString("q_tpch_q5")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size
    assert(shuffleJoins <= 1, s"expected ≤1 shuffle join, got $shuffleJoins\n$p")
  }

  test("q_tpch_q10: top-20 plans as TakeOrderedAndProject, return-flag filter pushed") {
    val p = planString("q_tpch_q10")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter not pushed to the lineitem scan:\n" + p)
  }

  test("q_semi_join / q_anti_join plan as semi/anti, not inner+dedup") {
    assert(planString("q_semi_join").contains("LeftSemi"))
    assert(planString("q_anti_join").contains("LeftAnti"))
  }

  test("AQE re-plans at runtime: post-shuffle partitions coalesced") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"), p)
    assert(p.contains("AQEShuffleRead coalesced"),
      "AQE did not coalesce the tiny shuffle:\n" + p)
  }

  test("q_dedup_embed: bucketed LSH plan, no nested loop over the corpus") {
    val p = planString("q_dedup_embed")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "corpus self-compare must come from bucket equality joins:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dedup_jaccard: inverted-index exchange planned once and reused") {
    // at testdata sizes every join broadcasts (nothing shuffles, nothing
    // to reuse) — force the shuffle-join shape the operator takes at real
    // corpus scale and assert the self-join's shingle-hash exchange is
    // planned once (AQE off so ReuseExchange is visible at planning)
    val conf = spark.conf
    val (aqe, bc) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = SparkEntry.queries("q_dedup_jaccard")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        "self-join should reuse the shuffle on the shingle hash:\n" + p)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("q_record_linkage: JW verify on the distinct-name domain, matches broadcast") {
    // the r8 compute-on-distinct contract: the Jaro-Winkler expression
    // must sit ABOVE the name-distinct aggregate (verify cost = name
    // domain, not record count), and the matched name pairs — a
    // domain-sized frame — must reach the record expansion as a
    // broadcast, so the only record-sized work is scan + equi-join.
    val p = planString("q_record_linkage")
    val jwPos = p.indexOf("jaro_winkler")
    assert(jwPos >= 0, "codegen'd JW expression missing:\n" + p)
    // the plan prints top-down: everything BELOW the JW filter feeds it;
    // a HashAggregate (the name distinct) must appear among its inputs
    assert(p.indexOf("HashAggregate", jwPos) >= 0,
      "JW not evaluated over the distinct-name aggregate:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "matched name pairs should broadcast into the expansion:\n" + p)
  }

  test("PageRank iteration: checkpointed edge partitioning reused, ranks-only shuffle") {
    // the scale claim in graph/PageRank.scala: after the one-time
    // repartition(src) + localCheckpoint, each iteration's join must NOT
    // re-shuffle the edge side — only the |V|-row rank table and the
    // dst-keyed mass aggregation may exchange. Broadcast off to force
    // the shuffle-join shape the operator takes at real graph scale.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val (aqe, bc) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = spark.range(1000)
        .select((col("id") % 100).as("src"), ((col("id") + 7) % 100).as("dst"))
      val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      val withDeg = und.join(deg, "src").repartition(col("src"))
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val ranks = deg.select(col("src").as("node"), lit(0.01).as("pr"))
      val iter = withDeg.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      val p = iter.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      // ranks side of the join + the dst-keyed aggregation = 2; a third
      // would mean the checkpointed edges are being re-shuffled per round
      assert(shuffles <= 2, s"expected ≤2 shuffles per iteration, got $shuffles:\n$p")
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("label-prop round: src-bucketed edges + broadcast labels = zero shuffles") {
    // the r13 claim in Analytics23.qLabelProp: after the one-time
    // repartition(src) + localCheckpoint, a round joins the node-sized
    // label frame as a BROADCAST on dst, and the join output's src
    // partitioning satisfies both the (src,lbl) count grouping and the
    // (src) argmax grouping — a round plans NO hash exchange at all.
    // Scoping the two figures on record (r14, VERDICT task 4): the
    // ROUNDS-ONLY portion (the 3 iterations this test models, edge
    // construction excluded) moved 17.5× → 4.4× on the sf1→sf10
    // decade; the WHOLE-QUERY step incl. the one-time edge build
    // (items self-join + distinct + repartition — the only remaining
    // data-sized shuffles) is the 11.0× PLANS.md r13 reports. AQE off
    // so the asserted plan is the static one the claim is about.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val e = spark.range(1000)
        .select((col("id") % 100).as("src"), ((col("id") + 7) % 100).as("dst"))
      // MEMORY_AND_DISK_SER as in qLabelProp (r15): the storage level
      // must not change the captured partitioning the zero-shuffle
      // claim rests on
      val edges = e.repartition(col("src")).distinct()
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val labels = edges.select(col("src").as("id")).distinct()
        .localCheckpoint().withColumn("lbl", col("id"))
      val round = edges.join(broadcast(labels), edges("dst") === labels("id"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("src").as("id"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("lbl"))
      val p = round.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(shuffles == 0, s"expected a shuffle-free round, got $shuffles:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        "labels should broadcast into the round join:\n" + p)
      // the seed-label derivation is also exchange-free: distinct on src
      // rides the edges' src partitioning (partition keys ⊆ grouping keys)
      val seedPlan = edges.select(col("src").as("id")).distinct()
        .queryExecution.executedPlan.toString
      assert(!seedPlan.contains("Exchange hashpartitioning"),
        "seed ids should ride the edge bucketing:\n" + seedPlan)
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("|E| edge checkpoint persists SERIALIZED with memory AND disk") {
    // r15 storage policy (VERDICT r14 task 1): the |E|-sized graph
    // checkpoints must be serialized (bounded incremental unroll — the
    // deserialized default OOM'd sf31/sf100) AND memory-eligible (the
    // blanket DISK_ONLY forfeited RAM residency where the edges fit,
    // 2.5× at harmonic sf10) AND disk-backed (spill, not eviction-and-
    // recompute, under pressure). Run a label-prop round end to end and
    // assert some persisted RDD carries exactly that level — the
    // node-sized label frames keep the deserialized default, so the
    // serialized one is the edge checkpoint.
    // retried up to 3× (r16): suites share one SparkContext and run in
    // parallel, so the getPersistentRDDs diff can race both a concurrent
    // suite's checkpoints and the ContextCleaner unpersisting ours —
    // observed as a once-in-a-batch flake. The property itself is
    // deterministic; only the snapshot is racy.
    import org.apache.spark.sql.functions._
    val ok = (1 to 3).exists { _ =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries("q_label_prop")(spark, sfDir).collect()
      val fresh = spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }.values.map(_.getStorageLevel)
      fresh.exists(l => l.useMemory && l.useDisk && !l.deserialized)
    }
    assert(ok, "expected a MEMORY_AND_DISK_SER-class checkpoint from a " +
      "q_label_prop run (3 attempts)")
    // NOTE: the former "no DISK_ONLY anywhere" negative assert is gone —
    // it raced both concurrent suites and this file's OWN storage-level
    // test (PlanSpec ~:204 creates a DISK_ONLY checkpoint on the shared
    // context); the positive SER assert above is the policy pin.
  }

  test("no query plans a CartesianProduct (sweep over the full registry)") {
    // pair generators must arrive as equality joins (inverted index, LSH
    // bands, buckets) or broadcast nested loops — an unbroadcast cartesian
    // at 100 TB is a non-starter. Building the physical plan is cheap;
    // nothing executes here (ML fit/simulation queries excluded: their
    // DataFrame construction itself runs jobs).
    val skip = Set("q_glm_poisson", "q_simulation",
      "q_knn_ivf", "q_fifa_star", "q_etl_star",
      // iterative: label propagation runs jobs while BUILDING the frame
      "q_dedup_clusters", "q_curate_full",
      // writes + re-reads the parquet signature store during construction
      "q_dedup_incremental",
      // r16: q_decontam_bloom left the skip list — the sketch now rides
      // a scalar subquery, so construction no longer runs a driver job
      // iterative: PageRank counts nodes + checkpoints while BUILDING
      "q_pagerank",
      // BPE collects the capped vocab + runs the merge loop while BUILDING
      "q_bpe_merges",
      // writes + re-reads the aggregate state store during construction
      "q_incr_agg",
      // r12 (ADVICE): g = max(1, n/1000) is a bounded driver scalar, so
      // construction runs a count() job — covered by the dedicated
      // semdedup test below at a literal g (plan shape is g-independent)
      "q_semdedup", "q_semdedup_deep")
    SparkEntry.queries.keys.filterNot(skip).foreach { name =>
      val p = planString(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("dupClusters round: src-cached edges never re-exchange, seed rides the cache") {
    // the r16 claim in Dedup.dupClusters: the edge list is cached
    // hash-partitioned on src ONCE, the propagation join keys on src
    // (legal because the edge set is symmetric by construction), so a
    // round's only hash exchange is the node-sized label merge — the
    // |E|-row cache is never re-shuffled. Broadcast off to force the
    // shuffle-join shape the operator takes when labels outgrow
    // broadcast at real pair-graph scale; AQE off so the asserted plan
    // is the static one the claim is about.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val (aqe, bc) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pairsDf = spark.range(500)
        .select((col("id") % 50).as("a_id"), ((col("id") + 13) % 50).as("b_id"))
        .filter(col("a_id") =!= col("b_id"))
      val fwd = pairsDf.select(col("a_id").as("src"), col("b_id").as("dst"))
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src")).cache()
      // count REAL exchange operators on the tree: string matching
      // overcounts (InMemoryTableScan/ReusedExchange descriptions echo
      // the cached/original exchange's text, which executes once at
      // cache build, not per round)
      def nShuffles(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
      try {
        // seed labels = min(self, neighbors) grouped on src: must ride
        // the cache's src partitioning, zero exchanges
        val seed = edges
          .select(col("src").as("id"), least(col("src"), col("dst")).as("cluster_id"))
          .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        assert(nShuffles(seed) == 0,
          "seed labels should ride the edge cache's src partitioning:\n" +
            seed.queryExecution.executedPlan.toString)
        val labels = seed.localCheckpoint()
        val round = edges.join(labels, edges("src") === labels("id"))
          .select(edges("dst").as("id"), col("cluster_id"))
          .union(labels)
          .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        // the union+merge aggregation = 1; a second would mean the join
        // is re-shuffling the cached edge list every round
        val shuffles = nShuffles(round)
        assert(shuffles <= 1, s"expected ≤1 shuffle per round, got $shuffles:\n" +
          round.queryExecution.executedPlan.toString)
      } finally edges.unpersist()
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("BigStar half-round: one u-keyed exchange serves distinct, mins and join") {
    // the r16 claim in graph/BigStar.sym: repartition(u) before the
    // (u,v) distinct means hashpartitioning(u) satisfies the distinct,
    // the neighborhood-min groupBy(u), and the se⋈mins join on u — a
    // half-round plans exactly the ONE exchange it forces, where the
    // (u,v)-hashed distinct made the aggregate and the join each
    // re-exchange |E| rows
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val (aqe, bc) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = spark.range(500)
        .select((col("id") % 50).as("u"), ((col("id") + 13) % 50).as("v"))
        .filter(col("u") =!= col("v"))
      val se = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")).distinct()
      val mins = se.groupBy("u").agg(min(least(col("u"), col("v"))).as("m"))
      val joined = se.join(mins, "u")
      val p = joined.queryExecution.executedPlan.toString
      // the mins side arrives via ReusedExchange (whose description
      // echoes the original exchange's text) — count tree nodes, not text
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      assert(shuffles == 1,
        s"expected the single repartition(u) exchange, got $shuffles:\n$p")
      assert(p.contains("ReusedExchange"),
        "mins side should reuse the repartition(u) exchange:\n" + p)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("q_semdedup plans no CartesianProduct (literal g, no count job)") {
    // the registry entry is excluded from the sweep above because its
    // construction resolves g with a count(); the plan SHAPE does not
    // depend on g, so assert the cartesian-free property at g = 2
    val p = graft.queries.DedupSim
      .semdedup(Tables.embeddings(spark, sfDir), 2L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"semdedup plans a cartesian:\n$p")
    // and the generalized depth keeps the property (r13)
    val p4 = graft.queries.DedupSim
      .semdedup(Tables.embeddings(spark, sfDir), 2L, 4)
      .queryExecution.executedPlan.toString
    assert(!p4.contains("CartesianProduct"), s"L=4 semdedup plans a cartesian:\n$p4")
  }
}
