package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, FormatPhone}

/** The engine's SparkSessionExtensions: registers the custom native
  * expressions into the function registry so they're callable from
  * SQL and `call_function` alike. Loadable by class name via
  * `spark.sql.extensions=graft.GraftSparkExtensions` on any cluster,
  * or programmatically via `builder.withExtensions` ([[GraftSession]]).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        arity("dot_product", children, 2)
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("format_phone"),
      new ExpressionInfo(classOf[FormatPhone].getName, "format_phone"),
      (children: Seq[Expression]) => {
        arity("format_phone", children, 1)
        FormatPhone(children.head)
      }))
  }

  /** Wrong arity must be an analysis-time error naming the function —
    * `children(i)` alone would silently drop extras or crash with a
    * bare NoSuchElementException. */
  private def arity(name: String, children: Seq[Expression], n: Int): Unit =
    require(children.length == n,
      s"$name requires exactly $n argument(s), got ${children.length}")
}
