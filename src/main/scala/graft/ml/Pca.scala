package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column, Spark-first:
  *
  *  - ONE pass over the data computes the sufficient statistics
  *    (Σx per dim and Σ x·xᵀ per dim pair) as a single
  *    [[graft.functions.VectorStats]] typed aggregate — each task
  *    accumulates one (d + d² + 1)-double buffer and partial
  *    aggregation merges buffers elementwise, so the shuffle carries
  *    d + d² + 1 doubles PER TASK regardless of row count and the
  *    map side does ZERO row amplification. (The original
  *    posexplode(flat-stats) → groupBy(idx) → sum formulation computed
  *    identical sums but materialized d + d² UnsafeRows per input row
  *    — 4,160× amplification at d = 64 — purely to feed a hash-agg;
  *    r15 measured q_pca_project 4.55 → 0.9 s at sf0.1 (~5×) and the
  *    gap is amplification-bound, so it widens with d.)
  *  - The d×d covariance (E[xxᵀ] − μμᵀ) is DRIVER-SIZED by construction
  *    (d = embedding width, 64 here → 32 KB), so the eigensolve runs on
  *    the driver: classical cyclic-Jacobi sweeps — deterministic
  *    (fixed sweep order, fixed iteration count, no RNG), numerically
  *    robust for symmetric matrices.
  *  - Projection back over the data is a narrow per-row dot product
  *    against the eigenvector LITERALS — whole-stage-codegen'd, zero
  *    shuffle, the same inlined-literal shape as the IVF centroid
  *    assignment ([[graft.similarity.Ivf]]).
  *
  * This is the textbook sufficient-statistic collapse (same design as
  * [[PoissonModel]]'s IRLS): iterate on driver-sized aggregates, touch
  * the full data exactly twice (fit pass + project pass).
  */
object Pca {

  /** Eigen-decomposition result: `components(k)(d)` row-major top-k
    * eigenvectors (unit norm, sign-fixed: largest-|component| entry
    * positive), `eigenvalues` descending, `totalVar` = trace(cov). */
  final case class Fit(components: Array[Array[Double]],
                       eigenvalues: Array[Double],
                       totalVar: Double)

  /** One-pass sufficient statistics → covariance → driver Jacobi.
    * `vecs` must expose `emb: array<double>` of constant width `dim`. */
  def fit(vecs: DataFrame, dim: Int, k: Int): Fit = {
    val flatN = vecs
      .select(graft.functions.VectorStats.vector_stats(col("emb")))
      .head().getSeq[Double](0).toArray
    require(flatN.length == dim + dim * dim + 1,
      s"Pca.fit: vector_stats returned ${flatN.length} cells for dim=$dim")
    val n = flatN.last
    val flat = new Array[Double](dim + dim * dim)
    var i = 0
    while (i < flat.length) { flat(i) = flatN(i) / n; i += 1 }
    val mean = flat.take(dim)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      flat(dim + i * dim + j) - mean(i) * mean(j))
    jacobi(cov, k)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — 30 fixed sweeps
    * (far past convergence for d ≤ 256; deterministic by construction).
    * Standard two-sided rotation scheme (Golub & Van Loan §8.5). */
  private[graft] def jacobi(a0: Array[Array[Double]], k: Int): Fit = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 30) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // numerically stable tan of the annihilating rotation angle
            val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                    else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = (0 until d).map(i => (a(i)(i), i)).sortBy(e => (-e._1, e._2))
    val comps = eig.take(k).map { case (_, idx) =>
      val col = Array.tabulate(d)(r => v(r)(idx))
      // sign convention: entry with the largest |value| (first on ties)
      // is positive — makes the fit deterministic down to the sign
      val pivot = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(pivot) < 0) col.map(x => -x) else col
    }.toArray
    Fit(comps, eig.take(k).map(_._1).toArray, (0 until d).map(i => a0(i)(i)).sum)
  }

  /** Projection column: dot(emb, component) as an inlined-literal
    * expression — per-row, codegen'd, shuffle-free. */
  def projection(emb: Column, component: Array[Double]): Column = {
    val pc = array(component.map(lit): _*)
    aggregate(zip_with(emb, pc, (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
  }
}
