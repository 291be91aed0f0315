package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge. Spark 4 hides Column⇄Expression conversion
  * behind `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * custom Catalyst expressions need it to surface as user-facing Columns.
  * This is the conventional extension-library pattern (Delta, Sedona, etc.
  * host similar shims inside the org.apache.spark.sql namespace).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
