package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ENGINE-PORTABLE HyperLogLog (Flajolet et al. 2007) as a
  * [[TypedImperativeAggregate]] — the second member of the portable-
  * sketch family ([[CountMinEstimate]]'s md5 mode is the first): every
  * step of the register computation is replayable in ANY engine with
  * md5 and integer bit ops, so the ESTIMATE itself is
  * DuckDB-oracle-certifiable, unlike Spark's built-in
  * `approx_count_distinct`/`hll_sketch_agg` whose dense/sparse encoding
  * is implementation-specific (those stay covered as rows-only
  * q_approx_distinct / q_hll_union).
  *
  * Register derivation, SQL-replayable by construction:
  *  - h   = first 8 hex chars of md5(key) as a 32-bit value
  *    (`CAST('0x' || substr(md5(key), 1, 8) AS BIGINT)`);
  *  - idx = top p bits (`h >> (32-p)`);
  *  - w   = low 32−p bits; ρ = (32−p) − ⌊log₂ w⌋ for w > 0 else 33−p,
  *    with ⌊log₂ w⌋ = length(bin(w)) − 1 — pure integer/string ops,
  *    no floating log anywhere;
  *  - register = max ρ (merge = elementwise max: order-free, so the
  *    aggregate is partition-invariant by construction).
  *
  * The harmonic sum Σ 2^(−M_j) is a sum of dyadic rationals with
  * denominator ≤ 2^(33−p): every partial sum is exactly representable
  * in a double (m·2^(33−p) ≪ 2⁵³), so BOTH engines compute the
  * bit-identical sum as `sum(1.0 / (1 << M_j))` — no pow(), no libm.
  * The only libm call in the whole pipeline is ln() inside the
  * small-range linear-counting correction (E ≤ 2.5m and empty
  * registers exist) — its cross-engine ulp risk is bounded by the
  * final round(·, 2) and certified empirically at all three SFs.
  *
  * 100 TB shape: the buffer is m bytes (p=9 → 512 B) per group per
  * task, merged elementwise — shuffle volume is m bytes per task
  * whatever the key cardinality; this is THE sketch for
  * billions-of-distinct-keys census work.
  */
case class HllEstimate(
    child: Expression,
    pExpr: Expression = Literal(9),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr.eval().asInstanceOf[Number].intValue()
  private lazy val m: Int = 1 << p

  require(pExpr.foldable, "hll_estimate(key, p): p must be a literal")
  require(p >= 4 && p <= 24,
    s"hll_estimate(key, p): p must be in [4, 24], got $p — the register " +
      "index/shift math assumes at most 24 index bits")

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md5Local.get()
      d.reset()
      val bytes = d.digest(
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
        ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
      val idx = (h >>> (32 - p)).toInt
      val w = h & ((1L << (32 - p)) - 1)
      // rho = position of the first 1-bit in the low (32-p) bits;
      // floor(log2 w) = 63 - nlz(w) — integer-exact, replayed in SQL as
      // length(bin(w)) - 1
      val rho =
        if (w == 0) (32 - p) + 1
        else (32 - p) - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > (buf(idx) & 0xff)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // exact dyadic harmonic sum: 1.0 / (1L << M) is exact, and so is
    // every partial sum (common denominator 2^(33-p), total < 2^53)
    var s = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val reg = buf(i) & 0xff
      s += 1.0 / (1L << reg)
      if (reg == 0) zeros += 1
      i += 1
    }
    val alpha = HllEstimate.alphaFor(m)
    val raw = alpha * m * m / s
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    // 2-dp grid: the linear-counting branch's ln() is the single libm
    // call; everything else is bit-identical cross-engine
    BigDecimal(est).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): HllEstimate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllEstimate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllEstimate =
    copy(child = newChildren(0), pExpr = newChildren(1))
  override def prettyName: String = "hll_estimate"
}

object HllEstimate {
  import org.apache.spark.sql.{graftshim, Column}

  /** α_m from the HLL paper; for m ≥ 128 the asymptotic formula. The
    * DuckDB oracle inlines the identical decimal literal so both
    * engines start the estimate from the same double. */
  def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** DataFrame-side entry: `hllEstimate(col, 9)` → estimate double. */
  def hllEstimate(key: Column, p: Int = 9): Column =
    graftshim.column(HllEstimate(
      graftshim.expression(key), Literal(p)).toAggregateExpression())
}
