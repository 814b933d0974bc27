package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CountMinEstimate
import graft.queries.Analytics9

/** Count–min sketch aggregate: the CM guarantees (estimate ≥ exact,
  * bounded overestimate), partition-invariance of the merge, and the
  * registry query's consistency with exact per-key counts.
  */
class CmsSpec extends AnyFunSuite with SharedSpark {

  private val probes = Seq(1L, 2L, 3L, 4L, 5L)

  test("CMS never underestimates and overestimates within the sketch bound") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.filter(col("l_partkey").isin(probes: _*))
      .groupBy("l_returnflag", "l_partkey").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val n = li.count()
    val rows = Analytics9.qCmsFreq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val est = r.getLong(2)
      val ex = exact.getOrElse(key, 0L)
      assert(est >= ex, s"$key underestimated: $est < $ex")
      // deterministic loose bound: expected collision mass is N/width per
      // row; min over 4 rows should sit far under 8x that at this scale
      assert(est - ex <= math.max(8L * n / 1024, 16L), s"$key over by ${est - ex}")
    }
  }

  test("sketch result is invariant to partitioning (merge correctness)") {
    val li = Tables.lineitem(spark, sfDir).select("l_returnflag", "l_partkey")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_returnflag")
      .agg(CountMinEstimate.cmsEstimate(col("l_partkey"), probes, 4, 1024).as("est"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val whole = run(li)
    val split = run(li.repartition(7))
    assert(whole == split)
  }

  test("portable (md5) mode keeps the CM guarantees and merge invariance") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.filter(col("l_partkey").isin(probes: _*))
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = li.count()
    def run(df: org.apache.spark.sql.DataFrame) = df
      .agg(CountMinEstimate.cmsEstimate(col("l_partkey"), probes, 4, 1024,
        portable = true).as("est"))
      .collect().head.getSeq[Long](0)
    val ests = run(li)
    probes.zip(ests).foreach { case (p, est) =>
      val ex = exact.getOrElse(p, 0L)
      assert(est >= ex, s"md5 mode underestimated key $p: $est < $ex")
      assert(est - ex <= math.max(8L * n / 1024, 16L), s"$p over by ${est - ex}")
    }
    assert(run(li.repartition(7)) == ests, "md5 mode merge not partition-invariant")
  }

  test("sketch works through the SQL surface via cms_estimate registration") {
    graft.functions.GraftExtensions.install(spark)
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("cms_li")
    val viaSql = spark.sql(
      """SELECT cms_estimate(l_partkey, array(1L, 2L, 3L, 4L, 5L), 4, 1024) AS est
        |FROM cms_li""".stripMargin).collect().head.getSeq[Long](0)
    val viaDf = Tables.lineitem(spark, sfDir)
      .agg(CountMinEstimate.cmsEstimate(col("l_partkey"), probes, 4, 1024).as("est"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaDf)
  }
}
