package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column↔Expression converters —
  * the supported way to expose a custom Catalyst Expression through the
  * public Column API in Spark 4 (Column no longer wraps Expression
  * directly). */
object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Wrap a custom LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * private[sql]) — the entry point for whole-operator extensions such
    * as [[graft.plans.AsOfJoin]]. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** A DataFrame's analyzed plan + resolved output attributes, for
    * building custom logical nodes over existing frames. */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
  /** `types.AbstractDataType` is private[sql]; expressions outside the
    * spark package need it to declare `inputTypes` (analysis-time type
    * checking for SQL-registered functions). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
