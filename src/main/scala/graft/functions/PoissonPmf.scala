package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** poisson_pmf(k, lambda) as a codegen'd Catalyst expression — the F12
  * stretch goal from SURVEY.md §7.3: P(X=k) = e^-λ λ^k / k!, computed in
  * log space for stability. Powers relational expected-score queries so
  * the Monte-Carlo layer's math is also available columnar. */
case class PoissonPmf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "poisson_pmf"

  override protected def nullSafeEval(kAny: Any, lAny: Any): Any =
    PoissonPmf.compute(kAny.asInstanceOf[Int], lAny.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, l) =>
      s"${ev.value} = graft.functions.PoissonPmf.compute($k, $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PoissonPmf =
    copy(left = newLeft, right = newRight)
}

object PoissonPmf {
  /** Static so generated code can call it directly. */
  def compute(k: Int, lambda: Double): Double = {
    if (k < 0 || lambda <= 0.0) return 0.0
    var logP = -lambda + k * math.log(lambda)
    var i = 2
    while (i <= k) { logP -= math.log(i); i += 1 }
    math.exp(logP)
  }

  def poisson_pmf(k: Column, lambda: Column): Column =
    graftshim.column(PoissonPmf(graftshim.expression(k), graftshim.expression(lambda)))
}
