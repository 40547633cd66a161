package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into Spark's `private[sql]` Dataset construction so custom
  * logical operators can surface as user-facing DataFrames (sibling of
  * [[ColumnBridge]]; lives under `org.apache.spark.sql` solely to satisfy
  * the access modifier).
  */
object PlanBridge {

  /** Wrap a custom LogicalPlan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** EAGER Column → catalyst Expression conversion via the session's
    * converter. Unlike [[ColumnBridge.expression]]'s lazy
    * ColumnNodeExpression wrapper (which analysis never unwraps inside a
    * custom logical node, and which is not task-serializable), this returns
    * the real (possibly unresolved) catalyst tree, which the analyzer then
    * resolves normally.
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Idempotently add a planner strategy to the session (the imperative
    * dual of `SparkSessionExtensions.injectPlannerStrategy`, for sessions
    * built without graft extensions).
    */
  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    val cur = classicSpark.experimental.extraStrategies
    if (!cur.exists(_.getClass == s.getClass)) {
      classicSpark.experimental.extraStrategies = cur :+ s
    }
  }
}
