package graft

import org.scalatest.funsuite.AnyFunSuite

/** Isotonic calibration: the fit must equal the in-memory PAVA referee
  * (unique solution), be monotone, and preserve weighted mass.
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

  test("calibrated rates equal the weighted PAVA referee and are monotone") {
    val rows = graft.ml.Isotonic.calibrateReturns(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .sortBy(_._1)
    val raw = rows.map(r => r._3.toDouble / r._2)
    val expect = pava(raw, rows.map(_._2.toDouble))
    rows.indices.foreach { i =>
      assert(math.abs(rows(i)._4 - expect(i)) < 1e-4,
        s"x=${rows(i)._1}: ${rows(i)._4} vs ${expect(i)}")
    }
    // monotone non-decreasing
    assert(rows.map(_._4).sliding(2).forall(s => s.length < 2 || s(0) <= s(1) + 1e-9))
    // weighted mass preserved (PAVA invariant): Σ w·fit = Σ w·raw
    val massFit = rows.indices.map(i => rows(i)._2 * expect(i)).sum
    val massRaw = rows.indices.map(i => rows(i)._2 * raw(i)).sum
    assert(math.abs(massFit - massRaw) < 1e-6)
  }
}
