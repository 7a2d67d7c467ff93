package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made `Column` carry a ColumnNode instead of an Expression;
  * the converter (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`, so — like other Spark extension libraries — we
  * expose the two needed calls from inside the package. No Spark
  * internals are modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function on an EXISTING session (the
    * SparkSessionExtensions path only applies at session build time). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
