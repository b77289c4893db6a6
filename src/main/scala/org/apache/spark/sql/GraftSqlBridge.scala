package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` API: converting between the public
  * `Column` and catalyst `Expression` worlds (Spark 4's Column wraps a
  * ColumnNode; `classic.ExpressionUtils` does the translation). This is the
  * standard extension-library pattern for shipping custom catalyst
  * expressions outside the Spark source tree.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
