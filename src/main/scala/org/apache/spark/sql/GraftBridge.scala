package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst Expression bridge. Spark 4 moved the pre-4.x
  * `new Column(expr)` / `col.expr` surface behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so this repo exposes the
  * two conversions it needs from inside the `sql` package. No Spark
  * internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
