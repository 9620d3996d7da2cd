package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the
  * standard hook an external Spark-native library needs to expose
  * custom Catalyst expressions as `Column`s without requiring session
  * level extension config (the harness may hand us a session we did
  * not build). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a concrete Catalyst
    * expression (ExpressionUtils.expression returns a LAZY
    * ColumnNodeExpression wrapper that only materializes during
    * analysis — useless for driver-side inspection, e.g. manifest
    * file skipping). */
  def resolved(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a SQL function on an ALREADY-RUNNING session (the
    * extensions config only applies at session build time, and the
    * harness may hand us its own session). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
