package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for graft's native expressions.
  *
  * Spark 4 moved the conversion into `org.apache.spark.sql.classic
  * .ExpressionUtils`, which is `private[sql]`; a same-package bridge is the
  * standard way for an extension library to construct Columns from custom
  * Catalyst expressions without a SparkSessionExtensions round-trip through
  * the function registry.
  */
object GraftColumnBridge {
  def column(e: Expression): Column   = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
