package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters (Spark 4
  * moved `Column.expr` behind the ColumnNode abstraction).  This is the only
  * place the project reaches into Spark internals; everything else uses the
  * public API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
