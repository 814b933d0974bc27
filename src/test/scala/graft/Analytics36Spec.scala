package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics36

/** Independent in-memory referees for the r9 batch-18 queries. */
class Analytics36Spec extends AnyFunSuite with SharedSpark {

  test("deming: closed form replay; swapping axes inverts the slope") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val n = rows.length
    val mx = rows.map(_._1).sum / n; val my = rows.map(_._2).sum / n
    val cxx = rows.map(t => (t._1 - mx) * (t._1 - mx)).sum
    val cyy = rows.map(t => (t._2 - my) * (t._2 - my)).sum
    val cxy = rows.map(t => (t._1 - mx) * (t._2 - my)).sum
    val slope = (cyy - cxx + math.sqrt((cyy - cxx) * (cyy - cxx) + 4 * cxy * cxy)) / (2 * cxy)
    val row = Analytics36.qDeming(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getLong(1) / 1e6 - slope) < math.abs(slope) * 1e-6 + 1e-5)
    assert(math.abs(row.getLong(2) / 1e6 - (my - slope * mx)) < 1.0)
    // the slope solves its defining quadratic cxy·s² − (cyy−cxx)·s − cxy = 0
    // (relative to cyy — the axis-swap reciprocal identity cancels
    // catastrophically when cyy ≫ cxx, so test the quadratic instead)
    val resid = cxy * slope * slope - (cyy - cxx) * slope - cxy
    assert(math.abs(resid) / cyy < 1e-9)
  }

  test("gumbel fit: moment formulas with literal constants") {
    val maxima = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .groupBy(expr("year(day) * 12 + month(day)"))
      .agg(max("rev")).collect().map(_.getLong(1).toDouble)
    val k = maxima.length
    val mean = maxima.sum / k
    val sd = math.sqrt(maxima.map(x => (x - mean) * (x - mean)).sum / (k - 1))
    val sigma = sd * math.sqrt(6) / math.Pi
    val mu = mean - 0.5772156649015329 * sigma
    val row = Analytics36.qGumbelFit(spark, sfDir).collect().head
    assert(row.getLong(0) == k.toLong)
    assert(math.abs(row.getDouble(1) - sigma) < sigma * 1e-9 + 1e-3)
    assert(math.abs(row.getDouble(2) - mu) < math.abs(mu) * 1e-9 + 1e-3)
    // Gumbel mode mu sits below the mean of the maxima
    assert(row.getDouble(2) < mean)
  }

  test("jackknife ratio: leave-one-group-out replay") {
    val g = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), expr("l_orderkey = o_orderkey"))
      .join(Tables.customer(spark, sfDir), expr("o_custkey = c_custkey"))
      .groupBy("c_nationkey")
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val k = g.length
    val trev = g.map(_._1).sum; val tqty = g.map(_._2).sum
    val thetas = g.map(t => (trev - t._1).toDouble / (tqty - t._2))
    val mt = thetas.sum / k
    val se = math.sqrt((k - 1.0) / k * thetas.map(t => (t - mt) * (t - mt)).sum)
    val row = Analytics36.qJackknifeRatio(spark, sfDir).collect().head
    assert(row.getLong(0) == k.toLong)
    assert(math.abs(row.getDouble(1) - trev.toDouble / tqty) < 1e-5)
    assert(math.abs(row.getDouble(2) - se) < se * 1e-6 + 1e-5)
  }

  test("seqlen histogram: bit-length buckets, mass conservation") {
    val lens = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .map(_.getString(0).trim.split("\\s+").count(_.nonEmpty).toLong)
    val expected = lens.groupBy(v => 63 - java.lang.Long.numberOfLeadingZeros(v))
      .map { case (b, g) => b.toLong ->
        ((g.size.toLong, g.sum, g.min, g.max)) }
    val got = Analytics36.qSeqlenHistogram(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
    // doc mass conserves exactly; ppm shares within floor slack
    assert(got.values.map(_._1).sum == lens.length.toLong)
    assert(got.values.map(_._2).sum == lens.sum)
  }

  test("embed anisotropy: identity vs brute-force pairwise mean") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // micro-quantized unit vectors, as the query builds them
    val units = vecs.map { v =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.round(x / nrm * 1e6).toDouble / 1e6)
    }
    val n = units.length
    val dim = units.head.length
    val sums = (0 until dim).map(i => units.map(_(i)).sum)
    val norm2 = sums.map(s => s * s).sum
    val meanNorm2 = norm2 / (n.toDouble * n)
    val avgCos = (meanNorm2 * n - 1) / (n - 1)
    val row = Analytics36.qEmbedAnisotropy(spark, sfDir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - meanNorm2) < 1e-4)
    assert(math.abs(row.getDouble(2) - avgCos) < 1e-4)
    // brute-force check on a 40-vector sample: identity holds
    val sample = units.take(40)
    val cos = for (i <- sample.indices; j <- sample.indices if i != j)
      yield sample(i).zip(sample(j)).map { case (a, b) => a * b }.sum
    val brute = cos.sum / cos.size
    val sSums = (0 until dim).map(i => sample.map(_(i)).sum)
    val sNorm2 = sSums.map(s => s * s).sum
    val sAvg = (sNorm2 / sample.size - sample.map(u => u.map(x => x * x).sum).sum / sample.size) /
      (sample.size - 1)
    assert(math.abs(brute - sAvg) < 1e-9)
  }
}
