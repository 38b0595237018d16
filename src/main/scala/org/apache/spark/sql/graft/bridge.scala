package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) private[sql]; extension libraries shipping
  * custom Catalyst expressions expose them through a package-local shim —
  * the same pattern used by public Spark connector/extension projects.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session-aware conversion: fully converts ColumnNodes to catalyst
    * expressions (UnresolvedAttribute etc.) so the analyzer can resolve
    * them inside custom logical operators — `ExpressionUtils.expression`
    * only wraps lazily, which never resolves outside standard operators.
    */
  def sessionExpression(spark: org.apache.spark.sql.SparkSession,
                        c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** Resolved logical plan of a DataFrame (for embedding under custom
    * logical operators).
    */
  def plan(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Run a plan through the session's analyzer (resolution only). */
  def analyze(spark: org.apache.spark.sql.SparkSession,
              plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.executePlan(plan).analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
