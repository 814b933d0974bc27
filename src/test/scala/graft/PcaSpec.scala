package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Pca

/** Pins the PCA fit ([[graft.ml.Pca]]): the driver Jacobi against a
  * hand-solvable matrix, and the distributed sufficient-statistic fit
  * against linear-algebra invariants recomputed in memory from the same
  * data — residual, orthonormality, projected-variance ≡ eigenvalue.
  */
class PcaSpec extends AnyFunSuite with SharedSpark {

  test("jacobi solves the 2x2 textbook case exactly") {
    val fit = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)), 2)
    assert(math.abs(fit.eigenvalues(0) - 3.0) < 1e-12)
    assert(math.abs(fit.eigenvalues(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(fit.components(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(fit.components(1).zip(Array(r, -r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(math.abs(fit.totalVar - 4.0) < 1e-12)
  }

  private lazy val vecs = Tables.embeddings(spark, sfDir)
    .select(expr("transform(embedding, x -> cast(x as double))").as("emb"))
  private lazy val collected: Array[Array[Double]] =
    vecs.collect().map(_.getSeq[Double](0).toArray)
  private lazy val dim = collected.head.length
  private lazy val fit = Pca.fit(vecs, dim, k = 2)

  private def covInMemory: Array[Array[Double]] = {
    val n = collected.length.toDouble
    val mean = Array.tabulate(dim)(j => collected.map(_(j)).sum / n)
    Array.tabulate(dim, dim)((i, j) =>
      collected.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j))
  }

  test("distributed sufficient statistics reproduce the in-memory covariance eigen system") {
    val cov = covInMemory
    // residual ‖Cv − λv‖∞ per component
    for (c <- 0 until 2) {
      val v = fit.components(c); val lam = fit.eigenvalues(c)
      val res = (0 until dim).map(i =>
        math.abs((0 until dim).map(j => cov(i)(j) * v(j)).sum - lam * v(i))).max
      assert(res < 1e-8, s"component $c eigen residual $res")
    }
  }

  test("components are orthonormal and eigenvalues descend") {
    val Array(c1, c2) = fit.components
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    assert(math.abs(dot(c1, c1) - 1.0) < 1e-10)
    assert(math.abs(dot(c2, c2) - 1.0) < 1e-10)
    assert(math.abs(dot(c1, c2)) < 1e-10)
    assert(fit.eigenvalues(0) >= fit.eigenvalues(1))
    assert(fit.eigenvalues(1) >= 0.0)
  }

  test("projected population variance equals the eigenvalue") {
    val proj = vecs.select(Pca.projection(col("emb"), fit.components(0)).as("p"))
      .agg(var_pop(col("p"))).head().getDouble(0)
    assert(math.abs(proj - fit.eigenvalues(0)) < 1e-8,
      s"projected var $proj vs eigenvalue ${fit.eigenvalues(0)}")
  }

  test("vector_stats: [Σx, Σxxᵀ row-major, n] layout, nulls skipped, ragged loud") {
    import spark.implicits._
    import graft.functions.VectorStats.vector_stats
    val r = Seq(Array(1.0, 2.0), Array(3.0, 5.0)).toDF("emb")
      .select(vector_stats(col("emb"))).head().getSeq[Double](0)
    assert(r == Seq(4.0, 7.0, 10.0, 17.0, 17.0, 29.0, 2.0))
    val withNull = Seq(Some(Array(1.0, 2.0)), None).toDF("emb")
      .select(vector_stats(col("emb"))).head().getSeq[Double](0)
    assert(withNull == Seq(1.0, 2.0, 1.0, 2.0, 2.0, 4.0, 1.0))
    // a ragged width must fail loudly — a silent truncation would
    // corrupt every moment downstream
    val ex = intercept[Exception] {
      Seq(Array(1.0), Array(1.0, 2.0)).toDF("emb")
        .select(vector_stats(col("emb"))).head()
    }
    assert(ex.getMessage != null)
  }

  test("sign convention makes the fit deterministic") {
    val fit2 = Pca.fit(vecs, dim, k = 2)
    assert(fit.components(0).sameElements(fit2.components(0)))
    assert(fit.components(1).sameElements(fit2.components(1)))
    // the largest-|entry| coordinate is positive
    for (c <- fit.components) {
      val pivot = c.indices.maxBy(i => (math.abs(c(i)), -i))
      assert(c(pivot) > 0.0)
    }
  }
}
