package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column constructor (Spark 4 moved Column
  * onto ColumnNode; `classic.ExpressionUtils.column` is the one supported
  * conversion from a Catalyst [[Expression]] but is sql-package-private).
  * Living in `org.apache.spark.sql` is the standard extension-library
  * pattern for wrapping a custom native expression as a [[Column]] without
  * requiring callers to register SQL functions on every session. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
