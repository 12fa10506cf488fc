/* Bridge into Spark's private[sql] helpers — the conventional pattern
 * for Spark-extension libraries that build custom logical plans (the
 * DataFrame constructor and Column→Expression conversion are not
 * otherwise reachable from user code). Contains NO logic of its own.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftSqlBridge {

  /** Wrap a custom LogicalPlan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression behind a (classic) Column, EAGERLY
    * converted — ExpressionUtils.expression returns a lazy
    * ColumnNodeExpression wrapper that only resolves when the plan goes
    * through standard Dataset constructors, which a custom LogicalPlan
    * node does not.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** -0.0/NaN canonicalization for float/double (struct/array included)
    * grouping keys — identity for types that don't need it. Custom
    * operators must apply this themselves: Spark's optimizer rule only
    * covers its own Aggregate/Join/Window nodes.
    */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
