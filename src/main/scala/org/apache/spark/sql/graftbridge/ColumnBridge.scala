package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  * ExpressionUtils is private[sql]; exposing it from a subpackage is the
  * standard pattern for Spark extension libraries (cf. public snippets of
  * Qbeast/DataFusion-comet-style projects wrapping Dataset/Column internals).
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
