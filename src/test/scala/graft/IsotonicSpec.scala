package graft

import org.scalatest.funsuite.AnyFunSuite

/** Isotonic calibration: the integer-minimax fit must equal the in-memory
  * PAVA referee AND spark.ml's solver (the weighted-L2 solution is
  * unique), be monotone, and preserve weighted mass — all to within the
  * ppm quantization the oracle-exact readout introduces.
  */
class IsotonicSpec extends AnyFunSuite with SharedSpark {

  /** Textbook pool-adjacent-violators on weighted points sorted by x. */
  private def pava(ys: Array[Double], ws: Array[Double]): Array[Double] = {
    case class Block(var y: Double, var w: Double, var n: Int)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (i <- ys.indices) {
      blocks += Block(ys(i), ws(i), 1)
      while (blocks.length >= 2 && blocks(blocks.length - 2).y > blocks.last.y) {
        val b = blocks.remove(blocks.length - 1)
        val a = blocks.last
        a.y = (a.y * a.w + b.y * b.w) / (a.w + b.w)
        a.w += b.w; a.n += b.n
      }
    }
    blocks.flatMap(b => Array.fill(b.n)(b.y)).toArray
  }

  test("calibrated ppm equals the weighted PAVA referee and is monotone") {
    val rows = graft.ml.Isotonic.calibrateReturns(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1)
    val raw = rows.map(r => r._3.toDouble / r._2)
    val expect = pava(raw, rows.map(_._2.toDouble))
    rows.indices.foreach { i =>
      // floor-ppm of the unique solution: off by at most the quantum
      assert(math.abs(rows(i)._4 / 1e6 - expect(i)) < 2e-6,
        s"x=${rows(i)._1}: ${rows(i)._4} ppm vs ${expect(i)}")
    }
    // monotone non-decreasing (exact on the integer readout)
    assert(rows.map(_._4).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)))
    // weighted mass preserved (PAVA invariant): Σ w·fit = Σ w·raw, to
    // within one ppm quantum per point
    val massFit = rows.map(r => r._2 * (r._4 / 1e6)).sum
    val massRaw = rows.indices.map(i => rows(i)._2 * raw(i)).sum
    assert(math.abs(massFit - massRaw) <= rows.map(_._2).sum * 1e-6)
  }

  test("integer minimax agrees with spark.ml's PAVA solver") {
    val minimax = graft.ml.Isotonic.calibrateReturns(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(4))).toMap
    val solver = graft.ml.Isotonic.calibrateReturnsSolver(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getDouble(4))).toMap
    assert(minimax.keySet == solver.keySet)
    minimax.foreach { case (qty, ppm) =>
      assert(math.abs(ppm / 1e6 - solver(qty)) < 2e-6,
        s"qty=$qty: minimax $ppm ppm vs solver ${solver(qty)}")
    }
  }

  test("q_score_dist integer-micro grid tracks the float poisson pmf shape") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Ml.qScoreDist(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 33) // 3 returnflags x k=0..10
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val lam = rs.head._3 / 1e6
      val sorted = rs.sortBy(_._2)
      // w_micro(k)/1e6 ~ lam^k/k! with <=1 floor-quantum lost per step
      sorted.foreach { case (_, k, _, w, _) =>
        val exact = (1 to k.toInt).foldLeft(1.0)((a, j) => a * lam / j)
        assert(math.abs(w / 1e6 - exact) <= exact * 1e-5 + k * 1e-6,
          s"k=$k: w=$w vs ${exact * 1e6}")
      }
      // pmf_milli sums to ~1000 over the truncated grid (floor losses only)
      val s = sorted.map(_._5).sum
      assert(s >= 1000 - 11 && s <= 1000)
    }
  }
}
