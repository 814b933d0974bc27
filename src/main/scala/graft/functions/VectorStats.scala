package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** PCA sufficient statistics (Σx per dim, Σ x·xᵀ per dim pair, n) as ONE
  * [[TypedImperativeAggregate]] over the embedding column — the
  * mergeable-moments aggregate class ([[CountMinEstimate]]'s design with
  * a double buffer): each task accumulates a local (d + d² + 1)-length
  * buffer, partial aggregation merges buffers ELEMENTWISE, and the
  * driver reads back one row.
  *
  * This replaces [[graft.ml.Pca]]'s original
  * `posexplode(flatStats) → groupBy(idx) → sum` formulation, whose
  * map-side row amplification is d + d² per input row (4,160 UnsafeRows
  * per embedding at d = 64 — ~8.3 M exploded rows at sf0.1 and ~10¹³ at
  * the 100 TB deployment, all burned on hash-agg probing for what is
  * arithmetically one fused multiply-add per cell). The aggregate does
  * the same IEEE additions in the same per-partition row order with
  * ZERO amplification: row cost is the d² FMA loop itself, merge
  * traffic stays (d + d² + 1) doubles per task, and the result is
  * byte-identical for integer-valued inputs (exact sums — the
  * q_pca_portable oracle's precondition) and ulp-equivalent-class for
  * float inputs (both formulations are partition-ordered float sums;
  * neither promises a canonical order — PcaSpec's invariants are
  * tolerance-based for exactly this reason).
  *
  * Layout: `[Σx₀ … Σx_{d−1}, Σx₀x₀, Σx₀x₁, …, Σx_{d−1}x_{d−1}, n]` —
  * row-major moments, count last; the same flat indexing `Pca.fit`
  * already consumes. Rows whose vector is null are skipped; the first
  * non-null row fixes d and a mismatched later width is a loud error
  * (a silent truncation would corrupt every moment).
  */
case class VectorStats(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // dim is data-derived (first non-null row), so the empty buffer is the
  // "no rows seen yet" sentinel both update and merge understand
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](d + d * d + 1) else buf
    require(b.length == d + d * d + 1,
      s"vector_stats: ragged input — row width $d needs a ${d + d * d + 1}-cell " +
        s"buffer but the running buffer has ${b.length}")
    val e = new Array[Double](d)
    var i = 0
    while (i < d) { e(i) = arr.getDouble(i); b(i) += e(i); i += 1 }
    i = 0
    while (i < d) {
      val ei = e(i)
      val base = d + i * d
      var j = 0
      while (j < d) { b(base + j) += ei * e(j); j += 1 }
      i += 1
    }
    b(b.length - 1) += 1.0
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"vector_stats: merging buffers of widths ${a.length} and ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(n: Int): VectorStats =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VectorStats =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "vector_stats"
}

object VectorStats {
  /** Column-API entry point: `vector_stats(emb)` → one
    * `array<double>` row `[Σx…, Σxxᵀ…, n]`. */
  def vector_stats(emb: Column): Column =
    graftshim.column(VectorStats(graftshim.expression(emb)).toAggregateExpression())
}
