package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils` is private[sql] in
  * Spark 4.x). This file lives in the Spark namespace solely to re-export
  * the two conversions the engine's native expressions need.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
