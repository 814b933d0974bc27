package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration damped PageRank over an edge list — the iterative
  * graph-analytics sibling of the dedup layer's connected-components
  * closure (`dedup/Dedup.scala` min-label propagation), built from the
  * same scale primitives: the big side shuffles ONCE, the per-iteration
  * traffic is bounded by |V|, and lineage is truncated every round.
  *
  * Scale shape (100 TB = billions of edges):
  *  - `edges` is joined with its out-degrees, repartitioned by `src`,
  *    and localCheckpointed ONCE — every iteration's join then reuses
  *    that partitioning; only the rank table (|V| rows, the small side
  *    of the data) re-shuffles per round.
  *  - Each iteration is one equality join + one partial-aggregable sum
  *    — no driver-side state beyond the node count; ranks are
  *    localCheckpointed per round so the plan stays O(1)-deep instead
  *    of growing with iterations (on a real cluster swap
  *    localCheckpoint for a reliable checkpoint dir, as the
  *    connected-components operator documents).
  *  - Fixed iteration count, not convergence-tested: deterministic
  *    cost and a replayable oracle (unrolled CTEs); callers wanting
  *    convergence can compare successive outputs.
  *
  * Every node must have out-degree ≥ 1 (no dangling-mass redistribution
  * pass): symmetrize the edge list for undirected graphs — which also
  * guarantees every node receives mass, so the per-iteration node set
  * is stable. Rank mass then sums to exactly 1 per iteration
  * (spec-pinned on a fixture).
  */
object PageRank {

  /** @param edges directed (src: long, dst: long); symmetrize first for
    *              undirected semantics. Every src must also appear as a
    *              dst and vice versa (guaranteed by symmetrizing).
    * @return (ranks (node, pr), nodeCount) — pr sums to 1
    */
  def run(edges: DataFrame, iterations: Int = 3,
      damping: Double = 0.85): (DataFrame, Long) = {
    // Degrees via a count window over the ONE src exchange (r15): the
    // former groupBy-deg + join-back made the caller's edge pipeline
    // (lineitem⋈orders + distinct + union) execute three times — once
    // for the join's edge side, once under deg for n = deg.count(), and
    // once more under the rank seed. The window computes the identical
    // integer count on the already-repartitioned frame, and the node
    // frame below derives from the CHECKPOINT, so the edge pipeline now
    // runs exactly once. (No orderBy → whole-partition frame; WindowExec
    // groups by the partition key it is already clustered on.)
    val withDeg = edges
      .repartition(col("src"))
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      // |E|-sized checkpoint → MEMORY_AND_DISK_SER (r15, VERDICT r14
      // task 1; supersedes r14 DISK_ONLY): scanned once per iteration.
      // Deserialized residency OOM'd the heavy tail (unrolled row
      // objects compete with execution memory); DISK_ONLY avoided that
      // but paid +20% at sf10 by re-reading from disk where the edges
      // fit in RAM. Serialized blocks keep the bounded incremental
      // unroll (compact byte buffers, spill on pressure) and stay
      // RAM-resident when they fit — A/B'd per SF in PLANS.md r15.
      // The captured hashpartitioning(src) — the once-shuffled-edges
      // contract in the Scaladoc above — is unchanged.
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // node frame from the checkpoint — |V|-sized, seeds every iteration's
    // rank table, so it is materialized once too
    val nodes = withDeg.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iterations) {
      ranks = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node")
        .agg(sum("c").as("in_mass"))
        // (1.0 - damping) mirrored as an expression in the SQL oracle:
        // 1.0 - 0.85 is NOT the double literal 0.15 (off by one ulp)
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * col("in_mass")).as("pr"))
        .localCheckpoint()
    }
    (ranks, n)
  }
}
