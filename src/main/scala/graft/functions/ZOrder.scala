package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Z-order (Morton) interleave of two long keys — the clustering
  * value behind multidimensional data-skipping layouts: writing a table
  * range-partitioned and sorted by `zorder2(k1, k2)` makes BOTH keys'
  * per-file min/max spans narrow, so scans filtering on EITHER key prune
  * files (classic Morton-curve layout; see also Spark's own
  * RangePartitioning + parquet column statistics, which this composes
  * with — [[graft.operators.Layout.zorderLayout]]).
  *
  * Inputs are masked to their low 31 bits (the negative/overflow-free
  * range): bit i of each key lands at result bits 2i / 2i+1 via the
  * standard 5-step mask-and-spread, so the result stays in [0, 2^63) —
  * positive in every engine, no sign-comparison surprises. Pure integer
  * bit math: bit-identical across engines by construction, and codegen'd
  * so layout writes stay inside WholeStageCodegen.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // SQL-registered (user-callable): wrong types must fail at analysis
  // (type inferred — AbstractDataType itself is private[sql])
  override def inputTypes = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.spread(a.asInstanceOf[Long]) |
      (ZOrder2.spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val za = ctx.freshName("za")
      val zb = ctx.freshName("zb")
      def spread(v: String, x: String): String =
        s"""
           |long $v = $x & 0x7FFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2))  & 0x3333333333333333L;
           |$v = ($v | ($v << 1))  & 0x5555555555555555L;
         """.stripMargin
      s"""
         |${spread(za, a)}
         |${spread(zb, b)}
         |${ev.value} = $za | ($zb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 31 bits of x to the even bit positions 0,2,…,60. */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Column-API entry point for [[ZOrder2]]. */
  def zorder2(a: Column, b: Column): Column =
    graftshim.column(ZOrder2(graftshim.expression(a), graftshim.expression(b)))
}
