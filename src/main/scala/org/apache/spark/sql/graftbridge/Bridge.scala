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
}
