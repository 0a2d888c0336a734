package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column construction: wraps a raw Catalyst
  * Expression into a user-facing Column (the same mechanism Spark's own
  * `functions._` uses; placed under org.apache.spark.sql.* for the
  * qualified-private access, as OSS Spark extensions commonly do). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an already-analyzed LogicalPlan as a DataFrame (the same
    * `Dataset.ofRows` route Spark's own DataFrameReader uses) — needed
    * by graft's custom plan nodes (plans/NativeAsOfJoin.scala). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register an extra planner strategy on a LIVE session, idempotently. */
  def addStrategy(spark: org.apache.spark.sql.SparkSession,
                  strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Register a function builder on a LIVE session (the
    * SparkSessionExtensions route in GraftExtensions only applies at
    * session construction). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)
  }
}
