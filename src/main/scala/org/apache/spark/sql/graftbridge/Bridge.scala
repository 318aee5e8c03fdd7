package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column↔Expression conversion behind private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils). Custom Catalyst
  * expressions (SURVEY.md §7) need both directions; this bridge lives in a
  * subpackage of org.apache.spark.sql solely to re-export them. */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Clone a session: same SparkContext/cache/catalog, but an
    * independent SQLConf *copied* from the parent (unlike the public
    * `newSession()`, which resets runtime conf to builder defaults).
    * Lets a writer scope a conf override to one job without mutating —
    * or even locking — the user's session. */
  def cloneSession(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Re-bind a DataFrame's logical plan to another session (the write
    * path then resolves conf from that session, not the plan's origin). */
  def ofRows(s: org.apache.spark.sql.SparkSession,
             df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.logical)
}
