package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available in ANY session (spark-submit: --conf
  * spark.sql.extensions=graft.functions.GraftExtensions), without a
  * per-session register() call. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("parse_amount"),
      new ExpressionInfo(classOf[ParseAmount].getName, "parse_amount"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ParseAmount(exprs.head)))
  }
}
