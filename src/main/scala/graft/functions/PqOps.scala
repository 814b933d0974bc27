package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.typedlit
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Typed per-row expressions for the PQ/IVF ANN paths (r15 optimization
  * round). The former formulation inlined every codeword/centroid
  * component as its own literal inside per-candidate struct/dot subtrees
  * — thousands of Catalyst nodes per query, measured as 3–7 s of
  * DRIVER-side analysis/optimization/codegen per ANN query at sf0.1
  * (ProfileQuery: q_knn_ivfpq spent 6.9 s of 11.9 s outside any job).
  * Each expression here takes the codebook as ONE array literal
  * (constant-folded, zero per-row rebuild) and runs the identical
  * arithmetic as a fused loop, exactly the [[TreeArgmaxDot]] pattern.
  *
  * Determinism contract (all four expressions): dot products accumulate
  * left-to-right like [[DotProduct]]; squared-norm terms are driver-
  * precomputed and passed in (same values the old literals carried);
  * d² combines as `(emb² − 2.0·dot) + c²` / `(−2.0·dot) + c²` in that
  * association order; argmin ties break to the LOWER code/centroid id
  * via strict `<`. Outputs are bit-identical to the replaced trees —
  * PqSpec recall and parity properties pin this (all four expressions,
  * ivf_probe included).
  *
  * CodegenFallback: per-row work is m·ksub·dsub (PQ assign ≈ 1024) or
  * k·dim (IVF assign ≈ 1024) fused multiply-adds — boxing overhead is
  * noise next to the loop, as with TreeArgmaxDot.
  */
private[graft] object PqOpsUtil {
  /** Left-to-right dot of emb[off..off+len) against codeword row. */
  @inline def dotSlice(emb: ArrayData, off: Int, cv: ArrayData, len: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < len) {
      acc += emb.getDouble(off + i) * cv.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Packed PQ code for one embedding: per subspace j the argmin codeword
  * under d² = (−2.0·⟨sub,c⟩) + |c|² (ties → lower code), codes packed at
  * bit j·bits. `books` is the m×ksub×dsub codebook literal, `c2s` the
  * m×ksub driver-precomputed |c|² literal. */
case class PqEncodeExpr(emb: Expression, books: Expression,
    c2s: Expression, bitsExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(emb, books, c2s, bitsExpr)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    val bV = books.eval(input)
    val cV = c2s.eval(input)
    val btV = bitsExpr.eval(input)
    if (e == null || bV == null || cV == null || btV == null) return null
    val ev = e.asInstanceOf[ArrayData]
    val bArr = bV.asInstanceOf[ArrayData]
    val c2Arr = cV.asInstanceOf[ArrayData]
    val bits = btV.asInstanceOf[Int]
    val m = bArr.numElements()
    var packed = 0L
    var j = 0
    while (j < m) {
      val book = bArr.getArray(j)
      val c2row = c2Arr.getArray(j)
      val ksub = book.numElements()
      val dsub = if (ksub == 0) 0 else book.getArray(0).numElements()
      val off = j * dsub
      var best = Double.NaN
      var bestCode = 0
      var c = 0
      while (c < ksub) {
        val cv = book.getArray(c)
        val d2 = (-2.0 * PqOpsUtil.dotSlice(ev, off, cv, dsub)) + c2row.getDouble(c)
        // strict < keeps the lowest code on ties; NaN never replaces a
        // number; a number always replaces the NaN sentinel (matches the
        // former array_min over (d2, code) structs)
        if (d2 < best || (best != best && d2 == d2)) {
          best = d2
          bestCode = c
        }
        c += 1
      }
      packed += bestCode.toLong << (j * bits)
      j += 1
    }
    packed
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncodeExpr =
    copy(emb = newChildren(0), books = newChildren(1),
      c2s = newChildren(2), bitsExpr = newChildren(3))
}

/** ADC distance of one packed code against one query's m×ksub lookup
  * table: Σ_{j ascending} luts[j][(code >> j·bits) & mask] — the same
  * left fold as the former per-subspace element_at chain. */
case class PqLutSumExpr(code: Expression, luts: Expression,
    bitsExpr: Expression) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(code, luts, bitsExpr)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut_sum"

  override def eval(input: InternalRow): Any = {
    val cV = code.eval(input)
    val lV = luts.eval(input)
    val btV = bitsExpr.eval(input)
    if (cV == null || lV == null || btV == null) return null
    val packed = cV.asInstanceOf[Long]
    val lArr = lV.asInstanceOf[ArrayData]
    val bits = btV.asInstanceOf[Int]
    val mask = (1L << bits) - 1L
    val m = lArr.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      val nibble = ((packed >>> (j * bits)) & mask).toInt
      acc += lArr.getArray(j).getDouble(nibble)
      j += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqLutSumExpr =
    copy(code = newChildren(0), luts = newChildren(1), bitsExpr = newChildren(2))
}

/** Nearest-centroid id under d² = (emb² − 2.0·⟨emb,c⟩) + |c|², ties to
  * the lower centroid id. `cents` is the k×dim centroid literal aligned
  * with `cids`/`c2s`; emb² accumulates left-to-right once per row. */
case class IvfAssignExpr(emb: Expression, cents: Expression,
    c2s: Expression, cids: Expression) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(emb, cents, c2s, cids)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_assign"

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    val cV = cents.eval(input)
    val sV = c2s.eval(input)
    val idV = cids.eval(input)
    if (e == null || cV == null || sV == null || idV == null) return null
    val ev = e.asInstanceOf[ArrayData]
    val cArr = cV.asInstanceOf[ArrayData]
    val c2Arr = sV.asInstanceOf[ArrayData]
    val idArr = idV.asInstanceOf[ArrayData]
    val dims = ev.numElements()
    var emb2 = 0.0
    var i = 0
    while (i < dims) {
      val x = ev.getDouble(i)
      emb2 += x * x
      i += 1
    }
    val k = cArr.numElements()
    var best = Double.NaN
    var bestCid = if (k == 0) return null else idArr.getInt(0)
    var c = 0
    while (c < k) {
      val cv = cArr.getArray(c)
      val len = math.min(dims, cv.numElements())
      val d2 = (emb2 - 2.0 * PqOpsUtil.dotSlice(ev, 0, cv, len)) + c2Arr.getDouble(c)
      val cid = idArr.getInt(c)
      // lexicographic (d2, cid) min like the former array_min of structs:
      // lower d2 wins, equal d2 falls to the lower cid, NaN loses to any
      // number and the first entry seeds the NaN sentinel
      if (d2 < best || (d2 == best && cid < bestCid) ||
        (best != best && d2 == d2)) {
        best = d2
        bestCid = cid
      }
      c += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfAssignExpr =
    copy(emb = newChildren(0), cents = newChildren(1),
      c2s = newChildren(2), cids = newChildren(3))
}

/** The `nprobe` nearest centroid ids in ascending (d², cid) order — the
  * probe-side analog of [[IvfAssignExpr]], replacing array_sort over
  * per-centroid structs + slice. Returns array<int> of min(nprobe, k). */
case class IvfProbeExpr(emb: Expression, cents: Expression,
    c2s: Expression, cids: Expression, nprobeExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(emb, cents, c2s, cids, nprobeExpr)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_probe"

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    val cV = cents.eval(input)
    val sV = c2s.eval(input)
    val idV = cids.eval(input)
    val npV = nprobeExpr.eval(input)
    if (e == null || cV == null || sV == null || idV == null || npV == null)
      return null
    val ev = e.asInstanceOf[ArrayData]
    val cArr = cV.asInstanceOf[ArrayData]
    val c2Arr = sV.asInstanceOf[ArrayData]
    val idArr = idV.asInstanceOf[ArrayData]
    val nprobe = npV.asInstanceOf[Int]
    val dims = ev.numElements()
    var emb2 = 0.0
    var i = 0
    while (i < dims) {
      val x = ev.getDouble(i)
      emb2 += x * x
      i += 1
    }
    val k = cArr.numElements()
    val d2s = new Array[Double](k)
    val ids = new Array[Int](k)
    var c = 0
    while (c < k) {
      val cv = cArr.getArray(c)
      val len = math.min(dims, cv.numElements())
      d2s(c) = (emb2 - 2.0 * PqOpsUtil.dotSlice(ev, 0, cv, len)) + c2Arr.getDouble(c)
      ids(c) = idArr.getInt(c)
      c += 1
    }
    // ascending (d2, cid) selection of the first nprobe — the same total
    // order as array_sort over (d2, cid) structs (Spark sorts NaN last
    // among doubles; java.lang.Double.compare does too)
    val idx = Array.range(0, k).sortBy(c => (d2s(c), ids(c)))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
    val n = math.min(nprobe, k)
    val out = new Array[Int](n)
    var j = 0
    while (j < n) { out(j) = ids(idx(j)); j += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfProbeExpr =
    copy(emb = newChildren(0), cents = newChildren(1), c2s = newChildren(2),
      cids = newChildren(3), nprobeExpr = newChildren(4))
}

object PqOps {
  /** Driver-precomputed |c|² per codeword, the same Scala `.sum` fold the
    * inlined-literal form embedded. */
  private def c2Of(books: Array[Array[Array[Double]]]): Seq[Seq[Double]] =
    books.toIndexedSeq.map(_.toIndexedSeq.map(cv => cv.map(x => x * x).sum))

  def pq_encode(emb: Column, books: Array[Array[Array[Double]]], bits: Int): Column =
    graftshim.column(PqEncodeExpr(
      graftshim.expression(emb),
      graftshim.expression(typedlit(books.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq)))),
      graftshim.expression(typedlit(c2Of(books))),
      graftshim.expression(typedlit(bits))))

  def pq_lut_sum(code: Column, luts: Array[Array[Double]], bits: Int): Column =
    graftshim.column(PqLutSumExpr(
      graftshim.expression(code),
      graftshim.expression(typedlit(luts.toIndexedSeq.map(_.toIndexedSeq))),
      graftshim.expression(typedlit(bits))))

  private def centLits(cents: Array[(Int, Array[Double])])
      : (Column, Column, Column) = (
    typedlit(cents.toIndexedSeq.map(_._2.toIndexedSeq)),
    typedlit(cents.toIndexedSeq.map { case (_, cv) => cv.map(x => x * x).sum }),
    typedlit(cents.toIndexedSeq.map(_._1)))

  def ivf_assign(emb: Column, cents: Array[(Int, Array[Double])]): Column = {
    val (cv, c2, id) = centLits(cents)
    graftshim.column(IvfAssignExpr(
      graftshim.expression(emb), graftshim.expression(cv),
      graftshim.expression(c2), graftshim.expression(id)))
  }

  def ivf_probe(emb: Column, cents: Array[(Int, Array[Double])],
      nprobe: Int): Column = {
    val (cv, c2, id) = centLits(cents)
    graftshim.column(IvfProbeExpr(
      graftshim.expression(emb), graftshim.expression(cv),
      graftshim.expression(c2), graftshim.expression(id),
      graftshim.expression(typedlit(nprobe))))
  }
}
