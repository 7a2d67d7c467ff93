package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftSqlBridge

/** Session extension registering graft's custom expressions for SQL
  * users — `SELECT array_dot(a, b)` works in `spark.sql` once the
  * session is built with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * For an already-built session use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))))
}

object GraftExtensions {
  /** Register graft functions on an existing session. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "array_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)))
}
