package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries as ONE native Catalyst expression.
  *
  * Semantics are bit-identical to the higher-order-function construction
  * this replaces (and to the DuckDB oracle that replays it): positions
  * are 1-based; position i (window ≤ i < n) is a cut when
  * Σ_{j=1..8} code[i−8+j]·31^{j−1} ≡ 0 (mod 64); the document end n is
  * always appended. Codes are Unicode code points — exactly what
  * `ascii()` over `split(text, '')` yielded (Java's regex split is
  * codepoint-aware, so the old path never halved a surrogate pair).
  *
  * Why an expression and not the transform/filter pipeline: Spark's
  * higher-order array functions NEVER enter whole-stage codegen — each
  * element evaluation walks the interpreted Expression tree, and the
  * boundary filter captured the O(n) codes transform inside its lambda,
  * re-evaluating it per position → O(n²·w) per document. Measured on
  * sf0.1 documents (5k docs, 1.5 MB text): >2000 s in one task. This
  * kernel is one O(n·w) compiled pass: the same corpus chunks in
  * milliseconds.
  */
case class CdcBounds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cdc_bounds"

  override protected def nullSafeEval(input: Any): Any =
    CdcKernel.bounds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcKernel.bounds($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)
}

object CdcKernel {
  private final val Base = 31L
  private final val Window = 8
  private final val Divisor = 64L
  private val powers: Array[Long] = Array.iterate(1L, Window)(_ * Base)

  /** One pass over the codepoint form; 8-term window sum per position
    * (12M multiply-adds over all of sf0.1 — cheaper than a rolling
    * update's division bookkeeping and trivially identical to the
    * spec'd sum). */
  def bounds(text: UTF8String): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(4, n / 48))
    var i = Window // 1-based cut position candidate
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < Window) {
        h += cps(i - Window + j).toLong * powers(j)
        j += 1
      }
      if (h % Divisor == 0L) out += i.toLong
      i += 1
    }
    out += n.toLong
    new GenericArrayData(out.toArray)
  }
}

object CdcBoundsFunctions {
  /** Column-API entry point for [[CdcBounds]]. */
  def cdc_bounds(text: Column): Column =
    graftshim.column(CdcBounds(graftshim.expression(text)))
}
