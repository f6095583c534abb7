package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 removed the public `new Column(expr)` / `col.expr` surface
  * (Connect refactor); the classic-mode converters live behind
  * `private[sql]`. This shim — placed in the `org.apache.spark.sql`
  * package, the standard extension-library technique — re-exports just
  * the two conversions graft's native expressions need.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
