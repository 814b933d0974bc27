package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Similarity.{dot, prepared}

/** IVF (inverted-file) approximate nearest neighbor: k-means-lite
  * centroids partition the corpus into cells; a query scans only its
  * `nprobe` nearest cells. The second scale path next to random-hyperplane
  * LSH ([[Similarity.lshTopK]]).
  *
  * Everything is DataFrame ops: assignment is a broadcast cross join
  * against k centroids + min-struct aggregation; centroid update is
  * posexplode → per-(cell,dim) mean → rebuild array. Deterministic given
  * the data (seeded by first-k init); at 100 TB the same plan holds —
  * centroids stay broadcast-sized, the corpus never self-joins. */
object Ivf {

  /** (vec_id, emb, nrm, cid) assignments plus the centroid table
    * (cid, cvec). Init = first k vectors by vec_id; `iters` Lloyd steps.
    *
    * The centroid table is k×dim — driver-sized by construction — so each
    * Lloyd step `collect`s it and restarts the next step from a local
    * relation (what spark.ml KMeans does). Without this the loop chains
    * lazy plans and iteration i re-executes all of 1..i-1; with it each
    * step is exactly one job over `v`. */
  def index(vecs: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val spark = vecs.sparkSession
    val v = prepared(vecs).select("vec_id", "emb", "nrm")
    def materialize(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    var centroids = materialize(
      v.orderBy("vec_id").limit(k)
        .select(col("vec_id").cast("int").as("cid"), col("emb").as("cvec")))
    for (_ <- 0 until iters) {
      centroids = materialize(
        assign(v, centroids)
          .select(col("cid"), posexplode(col("emb")).as(Seq("dim", "x")))
          .groupBy("cid", "dim").agg(avg("x").as("m"))
          .groupBy("cid")
          .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
          .select(col("cid"), transform(col("pairs"), p => p.getField("m")).as("cvec")))
    }
    (assign(v, centroids), centroids)
  }

  /** Nearest centroid per vector (min squared distance, cid tiebreak). */
  private def assign(v: DataFrame, centroids: DataFrame): DataFrame =
    v.crossJoin(broadcast(centroids))
      .withColumn("d2",
        dot(col("emb"), col("emb")) - lit(2.0) * dot(col("emb"), col("cvec")) +
          dot(col("cvec"), col("cvec")))
      .groupBy("vec_id", "emb", "nrm")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("emb"), col("nrm"), col("best.cid").as("cid"))

  /** Approximate cosine top-k: each query probes its `nprobe` nearest
    * cells and ranks only those cells' vectors. */
  def topK(vecs: DataFrame, queries: DataFrame, k: Int,
           nCells: Int = 16, nprobe: Int = 8, iters: Int = 2): DataFrame = {
    val (assigned, centroids) = index(vecs, nCells, iters)
    val q = prepared(queries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("d2",
        dot(col("q_emb"), col("q_emb")) - lit(2.0) * dot(col("q_emb"), col("cvec")) +
          dot(col("cvec"), col("cvec")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2"), col("cid"))))
      .filter(col("pr") <= nprobe)
      .select("q_id", "q_emb", "q_nrm", "cid")
    val sims = assigned.join(probes, Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(dot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm")), 6))
    sims.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("sim"))
  }
}
