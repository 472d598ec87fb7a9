package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned hop over Spark's `private[sql]` wall: Column <->
  * Expression conversion for registering custom Catalyst expressions as
  * user-facing Columns (the same bridge pattern every Spark extension
  * library uses).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
