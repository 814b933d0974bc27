package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 tail batch 3: formula-level invariants for PSI, the bitmask
  * census, the correlation matrix, and priority sampling.
  */
class Analytics16Spec extends AnyFunSuite with SharedSpark {

  test("psi: per-bin terms non-negative (up to grid slack), total = bin sum") {
    val rows = graft.queries.Analytics16.qPsi(spark, sfDir).collect()
    val (tot, bins) = rows.partition(_.getAs[Long]("bin") == -1L)
    assert(tot.length == 1 && bins.nonEmpty)
    // (p-q)ln(p/q) >= 0 identically; 6dp grid rounding can dip 5e-7
    bins.foreach { r =>
      assert(r.getAs[Double]("psi_term") >= -5e-7, s"negative PSI term: $r")
    }
    val sum6 = math.round(bins.map(_.getAs[Double]("psi_term")).sum * 1e6) / 1e6
    assert(math.abs(sum6 - tot.head.getAs[Double]("psi_term")) <= 1e-6,
      "total row is not the bin sum")
  }

  test("bitflags: census conserves user-days and events, breadth = popcount") {
    val out = graft.queries.Analytics16.qBitflags(spark, sfDir).collect()
    assert(out.length > 1, "mask census degenerate (single combination)")
    out.foreach { r =>
      assert(r.getAs[Long]("breadth") ==
        java.lang.Long.bitCount(r.getAs[Long]("mask")).toLong)
    }
    val ev = Tables.events(spark, sfDir)
    val userDays = ev.select(col("user_id"), to_date(col("ts"))).distinct().count()
    val nEvents = ev.count()
    assert(out.map(_.getAs[Long]("n_user_days")).sum == userDays)
    assert(out.map(_.getAs[Long]("n_events")).sum == nEvents)
  }

  test("corr matrix: six pairs, all bounded") {
    val out = graft.queries.Analytics16.qCorrMatrix(spark, sfDir).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(v >= -1.0 && v <= 1.0, s"r out of range: $r")
    }
  }

  test("weighted sample: exactly the top-20 priorities, no duplicates") {
    val out = graft.queries.Analytics16.qWeightedSample(spark, sfDir).collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == 20)
    // re-derive every doc's priority and check the 20 sampled ones are
    // the global maxima (the without-replacement guarantee)
    val h = conv(substring(md5(concat(lit("ws-seed-1"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        ((col("n_chars").cast("double") * 4294967296.0)
          / (h + 1).cast("double")).as("pri"))
    val sampledIds = out.map(_.getAs[Long]("doc_id")).toSet
    val minSampled = all.filter(col("doc_id").isin(sampledIds.toSeq: _*))
      .agg(min("pri")).collect().head.getDouble(0)
    val maxUnsampled = all.filter(!col("doc_id").isin(sampledIds.toSeq: _*))
      .agg(max("pri")).collect().head.getDouble(0)
    assert(minSampled >= maxUnsampled,
      s"an unsampled doc outranks the sample: $maxUnsampled > $minSampled")
  }
}
