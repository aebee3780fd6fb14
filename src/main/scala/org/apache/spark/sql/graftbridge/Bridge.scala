package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column API independent of
  * Catalyst (`Column` wraps a `ColumnNode`); the conversion helpers live in
  * `org.apache.spark.sql.classic` with `private[sql]` visibility, so this
  * one-file subpackage re-exports them for graft's custom expressions —
  * the same access pattern third-party Spark extensions use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
