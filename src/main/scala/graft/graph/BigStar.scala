package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014) — the O(log² n)-round algorithm for graphs whose
  * DIAMETER makes per-round label propagation
  * ([[graft.dedup.Dedup.dupClusters]]) too slow: propagation needs
  * O(diameter) rounds, star contraction collapses long paths
  * exponentially. Near-dup graphs are near-cliques and don't need it;
  * web link graphs, co-occurrence chains, and social graphs do — this
  * is the path a 100 TB edge list takes.
  *
  *  - large-star(u): every STRICTLY LARGER neighbor v > u re-attaches to
  *    m = min(Γ(u) ∪ {u});
  *  - small-star(u): every v ≤ u (and u itself) attaches to m.
  *
  * Each half-round is one hash-agg (per-node neighborhood min) + one
  * equi-join back + distinct — all id-keyed shuffles, nothing
  * proportional to component size ever groups on one key beyond the
  * neighborhood agg (which is map-side combined). `localCheckpoint`
  * per round cuts lineage exactly as the propagation path does.
  * Convergence: per-node neighborhood minima only ever decrease, so
  * Σ min-label (exact decimal) is strictly decreasing until fixpoint —
  * the same one-aggregate detector dupClusters uses.
  */
object BigStar {

  /** (id, cluster_id = component minimum) for every node in `pairs`
    * (a_id/b_id edge columns) — same contract as
    * [[graft.dedup.Dedup.dupClusters]], different round complexity. */
  def components(pairs: DataFrame): DataFrame = {
    var edges = pairs
      .select(col("a_id").as("u"), col("b_id").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    // one u-keyed exchange serves the whole half-round (r16, guide §2.4):
    // hashpartitioning(u) satisfies the (u,v) distinct (partition keys ⊆
    // grouping keys), the neighborhood-min groupBy(u), AND the se⋈mins
    // equi-join on u — where the former (u,v)-hashed distinct forced the
    // aggregate and the join to each re-exchange |E| rows
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")).distinct()

    def mins(se: DataFrame): DataFrame =
      se.groupBy("u").agg(min(least(col("u"), col("v"))).as("m"))

    // exact fixpoint test: the per-node label assignment from round r
    // equals round r−1 (an except() over the just-checkpointed labels —
    // one id-keyed job per round; labels are tiny next to the edge list)
    var prevLabels: DataFrame = null
    var labels: DataFrame = null
    var done = false
    var round = 0
    while (!done && round < 64) {
      val se1 = sym(edges)
      val m1 = mins(se1)
      val large = se1.join(m1, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m1.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).repartition(col("u")).distinct()
      val se2 = sym(large)
      val m2 = mins(se2)
      val small = se2.join(m2, "u").filter(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m2.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).repartition(col("u")).distinct()
        .localCheckpoint()
      labels = mins(sym(small)).localCheckpoint()
      done = prevLabels != null && labels.except(prevLabels).isEmpty
      prevLabels = labels
      edges = small
      round += 1
    }
    // at the fixpoint every edge points at its component min
    labels.select(col("u").as("id"), col("m").as("cluster_id"))
  }
}
