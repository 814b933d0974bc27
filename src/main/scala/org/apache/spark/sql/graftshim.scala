package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column↔Expression converters —
  * the supported way to expose a custom Catalyst Expression through the
  * public Column API in Spark 4 (Column no longer wraps Expression
  * directly). */
object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
