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

  /** Wrap an (already analyzed) logical plan in a FRESH Dataset — fresh
    * QueryExecution, so optimization, physical planning and AQE re-run per
    * call under the CALLER's current conf. `Dataset.ofRows` went
    * `private[sql]` with the 4.x classic split, same as the Column bridge
    * above. The analyzer short-circuits on an already-analyzed plan
    * (AnalysisHelper.analyzed), so re-wrapping is O(1) driver work.
    */
  def ofRows(session: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Stable unique id of a session (`private[sql]` in 4.x) — the memo-key
    * component that replaces identityHashCode, which can collide after GC.
    */
  def sessionUUID(session: SparkSession): String =
    session.asInstanceOf[classic.SparkSession].sessionUUID
}
