package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Shim into Spark's `private[sql]` Column↔Expression bridge — the classic
  * (non-connect) API hides these behind the sql package; custom Catalyst
  * expressions need them to surface as Columns. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
