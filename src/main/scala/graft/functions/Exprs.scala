package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between `Column` and Catalyst `Expression` (see
  * [[org.apache.spark.sql.GraftBridge]] for why this indirection exists on
  * Spark 4).
  */
private[graft] object Exprs {
  def column(e: Expression): Column = GraftBridge.column(e)
  def expression(c: Column): Expression = GraftBridge.expression(c)
}
