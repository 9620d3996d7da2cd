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

  /** The ANALYZED logical plan of a DataFrame — resolved attributes
    * with stable expression ids, the form custom logical nodes must
    * be built from. */
  def analyzed(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a (custom) logical plan back into a DataFrame. */
  def ofRows(
      spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently install a planner strategy on a RUNNING session —
    * `experimental.extraStrategies` is the public hook; extensions
    * config only applies at session build time. */
  def installStrategy(
      spark: SparkSession,
      strategy: execution.SparkStrategy): Unit = {
    val e = spark.asInstanceOf[classic.SparkSession].experimental
    if (!e.extraStrategies.contains(strategy))
      e.extraStrategies = e.extraStrategies :+ strategy
  }

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
