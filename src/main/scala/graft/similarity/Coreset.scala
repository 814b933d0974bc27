package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy farthest-first k-center selection (Gonzalez 1985) — the
  * classic 2-approximation coreset: pick the point farthest from the
  * current set, k times. The curation use: a maximally-spread sample of
  * an embedding space (seed sets for active learning / eval panels /
  * diversity probes), complementing [[graft.queries.DedupSim]]'s
  * diversity-capped selection which works per-cluster.
  *
  * Scale shape: k driver-bounded iterations; each is ONE scan computing
  * min-distance-to-centers as a narrow per-row expression over the
  * center LITERALS (k·d doubles inlined — driver-sized by construction,
  * the same shape as the IVF centroid assignment), then a
  * TakeOrderedAndProject(1) argmax — never a global sort, never a
  * shuffle of the vectors. Total work O(k²·n·d); for coreset-sized k
  * (10s) that is k scans of the corpus, each embarrassingly parallel.
  * Determinism: ties on the float distance break on min vec_id, and the
  * seed is the min vec_id — no RNG anywhere.
  */
object Coreset {

  private def sqDist(emb: Column, center: Array[Double]): Column =
    aggregate(zip_with(emb, array(center.map(lit): _*), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  /** Selected centers in pick order: (vec_id, coverage radius BEFORE the
    * pick — the max over points of distance to the previous set; the
    * k-center objective value as the set grows). `vecs` needs
    * (vec_id: long, emb: array<double>). */
  def kCenter(vecs: DataFrame, k: Int): Seq[(Long, Array[Double], Double)] = {
    val v = vecs.select(col("vec_id"), col("emb")).cache()
    try {
      val first = v.orderBy("vec_id").limit(1).collect().head
      var picked = Vector((first.getLong(0),
        first.getSeq[Double](1).toArray, Double.NaN))
      while (picked.size < k) {
        val dcol = picked.map(p => sqDist(col("emb"), p._2)).reduce(least(_, _))
        val far = v.withColumn("d2", dcol)
          .orderBy(desc("d2"), asc("vec_id")).limit(1).collect().head
        picked = picked :+ ((far.getLong(0),
          far.getSeq[Double](1).toArray, math.sqrt(far.getDouble(2))))
      }
      picked.map(p => (p._1, p._2, p._3))
    } finally v.unpersist()
  }
}
