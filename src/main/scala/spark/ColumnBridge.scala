package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 made the classic converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so library code
  * that builds catalyst expressions directly (e.g. `With` common-
  * subexpression bindings, see [[graft.functions.Fns.let]]) needs this
  * one-hop re-export from inside the `org.apache.spark.sql` package —
  * the standard extension-library pattern, no private APIs re-implemented.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
