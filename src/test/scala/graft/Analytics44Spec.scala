package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics44

/** Independent in-memory referees for the r9 batch-26 queries. */
class Analytics44Spec extends AnyFunSuite with SharedSpark {

  test("silhouette: centroid replay; s in [-1, 1]") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 1e6)).toIndexedSeq))
    val dims = vecs.head._3.length
    val cents = vecs.groupBy(_._2).map { case (l, g) =>
      l -> (0 until dims).map(j => g.map(_._3(j)).sum / g.size)
    }
    val labels = cents.keys.toSeq.sorted
    val sMicro = vecs.map { case (_, l, xs) =>
      def d2(c: IndexedSeq[Long]) =
        (0 until dims).map(j => BigInt(xs(j) - c(j)) * (xs(j) - c(j))).sum
      val a = math.sqrt(d2(cents(l)).toDouble)
      val b = labels.filter(_ != l).map(o => math.sqrt(d2(cents(o)).toDouble)).min
      (l, math.round((b - a) / math.max(a, b) * 1e6))
    }
    val expected = sMicro.groupBy(_._1).map { case (l, g) =>
      l -> ((g.length.toLong, g.map(_._2).sum / g.length,
        g.count(_._2 < 0).toLong))
    }
    val got = Analytics44.qSilhouette(spark, sfDir).collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    got.values.foreach { case (_, m, _) => assert(m >= -1000000L && m <= 1000000L) }
  }

  test("mahalanobis diag: moment replay on one flag") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = li.groupBy(_._1).map { case (flag, g) =>
      val n = g.length
      def stats(f: ((String, Long, Long, Long)) => Long) = {
        val xs = g.map(t => f(t).toDouble)
        val m = xs.sum / n
        (m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
      }
      val (m1, v1) = stats(_._2); val (m2, v2) = stats(_._3); val (m3, v3) = stats(_._4)
      val out = g.count { t =>
        val d2 = (t._2 - m1) * (t._2 - m1) / v1 + (t._3 - m2) * (t._3 - m2) / v2 +
          (t._4 - m3) * (t._4 - m3) / v3
        d2 > 11.344867
      }.toLong
      flag -> ((n.toLong, out, out * 1000000L / n))
    }
    val got = Analytics44.qMahalanobisDiag(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the double op order differs slightly from the query's — allow the
    // census to wobble by a few boundary rows
    assert(got.keySet == expected.keySet)
    got.foreach { case (f, (n, out, ppm)) =>
      val (en, eout, _) = expected(f)
      assert(n == en)
      assert(math.abs(out - eout) <= 2, s"flag $f outliers $out vs $eout")
      assert(ppm <= 1000000L && ppm >= 0)
      // at the 99% cut, roughly ~1% +- wide margin should flag
      assert(out * 1000000L / n < 100000L)
    }
  }
}
