package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression conversions, for
  * graft's custom Catalyst expressions. Lives in the org.apache.spark.sql
  * package solely for access — the standard pattern for Spark extension
  * libraries that expose native expressions as Columns.
  */
object GraftShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst's plan-time size estimate (bytes) for a frame — the same
    * statistic the planner compares against autoBroadcastJoinThreshold.
    */
  def estimatedSizeInBytes(df: Dataset[_]): BigInt =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan.stats.sizeInBytes

  /** The session's autoBroadcastJoinThreshold in bytes (-1 = disabled). */
  def broadcastThreshold(df: Dataset[_]): Long =
    df.asInstanceOf[classic.Dataset[_]].sparkSession.sessionState.conf.autoBroadcastJoinThreshold
}
