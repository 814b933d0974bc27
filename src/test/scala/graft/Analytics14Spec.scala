package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 tail batch: internal invariants of the rank/association/graph/cap
  * operators that the row-level oracle can't express — the identities
  * that certify the FORMULAS, not just the fixture values.
  */
class Analytics14Spec extends AnyFunSuite with SharedSpark {

  test("spearman: rho bounded and tie-averaged ranks sum to n(n+1)") {
    val rows = graft.queries.Analytics14.qSpearman(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 && rho <= 1.0, s"rho out of range: $rho")
      // this testdata draws quantity and price independently, so the
      // association is near zero — pin that the statistic agrees
      assert(math.abs(rho) < 0.1, s"expected near-zero association, got $rho")
    }
    // Σ(2·avgrank) over a group is n(n+1) regardless of ties — the
    // invariant that certifies the tie-averaging arithmetic.
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
    val wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val wqt = Window.partitionBy("l_returnflag", "l_quantity")
    val bad = li
      .withColumn("x2", rank().over(wq).cast("long") * 2
        + count(lit(1)).over(wqt) - 1)
      .groupBy("l_returnflag")
      .agg(sum("x2").as("s"), count(lit(1)).as("n"))
      .filter(col("s") =!= col("n") * (col("n") + 1))
      .count()
    assert(bad == 0L, "tie-averaged rank sum violated n(n+1)")
  }

  test("cramers_v: bounded [0,1] and chi2 non-negative") {
    val r = graft.queries.Analytics14.qCramersV(spark, sfDir).collect().head
    val v = r.getAs[Double]("cramers_v")
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0, s"V out of range: $v")
  }

  test("clustering coefficient: corner tally is 3x the triangle count " +
      "and ppm bounded") {
    val out = graft.queries.Analytics14.qClusteringCoeff(spark, sfDir)
    val cornerSum = out.agg(sum("n_tri")).collect().head.getLong(0)
    val triCount = graft.queries.Graph.qTriangles(spark, sfDir)
      .collect().head.getAs[Long]("n_triangles")
    assert(cornerSum == 3 * triCount,
      s"corner tally $cornerSum != 3 * $triCount")
    val badPpm = out.filter(col("coeff_ppm") < 0 || col("coeff_ppm") > 1000000L)
      .count()
    assert(badPpm == 0L, "coefficient outside [0, 1e6] ppm")
  }

  test("domain cap: kept <= cap, kept+dropped = total, kept ids are the " +
      "smallest per domain") {
    val out = graft.queries.Analytics14.qDomainCap(spark, sfDir)
    val bad = out.filter(
      col("n_kept") > 8 || col("n_kept") + col("n_dropped") =!= col("n_docs")
        || (col("n_docs") >= 8 && col("n_kept") =!= 8)).count()
    assert(bad == 0L, "cap accounting violated")
    // deterministic policy: checksum of the 8 smallest doc_ids per domain
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
      .withColumn("domain", concat(col("source"), lit("/d"),
        (((col("doc_id") % 37) * (col("doc_id") % 37)) % 37).cast("string")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("domain").orderBy("doc_id")
    val expected = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .groupBy("domain").agg(sum("doc_id").as("exp_sum"))
    val mismatch = out.join(expected, "domain")
      .filter(col("kept_id_sum") =!= col("exp_sum")).count()
    assert(mismatch == 0L, "kept-id checksum does not match smallest-8 policy")
  }
}
