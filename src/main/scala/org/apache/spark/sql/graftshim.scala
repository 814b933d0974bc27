package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column↔Expression converters —
  * the supported way to expose a custom Catalyst Expression through the
  * public Column API in Spark 4 (Column no longer wraps Expression
  * directly). */
object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** `types.AbstractDataType` is private[sql]; expressions outside the
    * spark package need it to declare `inputTypes` (analysis-time type
    * checking for SQL-registered functions). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
