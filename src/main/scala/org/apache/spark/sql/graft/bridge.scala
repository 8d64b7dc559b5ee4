package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 moved `new Column(expr)` /
  * `col.expr` behind the sql-private classic ColumnNode API, so the shim
  * lives in the org.apache.spark.sql namespace (the standard pattern for
  * Spark extension libraries). */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression   = ExpressionUtils.expression(c)
}
