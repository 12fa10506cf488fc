package graft.plans

import org.apache.spark.sql.catalyst.expressions.{DynamicPruningExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types.BooleanType

/** Drops always-true runtime filters from V2 batch scans before the
  * scan ever sees them.
  *
  * When dynamic partition pruning is planned but later found
  * valueless (no reusable broadcast and the pruning subquery is not
  * worth running), Spark's `PlanAdaptiveDynamicPruningFilters` /
  * `PlanDynamicPruningFilters` neutralize the filter by substituting
  * `DynamicPruningExpression(true)` rather than removing the node.
  * `BatchScanExec` then feeds every runtime filter through
  * `DataSourceV2Strategy.translateRuntimeFilterV2`, which has no case
  * for a bare literal and logs
  * `WARN Can't translate true to source filter` on every execution —
  * noise that makes real translation failures (a genuinely unpushable
  * runtime filter) invisible in the logs.
  *
  * A literal-true filter prunes nothing by definition, so removing the
  * node is semantics-free. A `ColumnarRule` is the one extension point
  * that runs AFTER the true-substitution in both execution modes: AQE
  * applies columnar rules in `postStageCreationRules` per stage (the
  * substitution happens in the earlier `queryStagePreparationRules`),
  * and the non-adaptive `QueryExecution.preparations` lists
  * `PlanDynamicPruningFilters` before
  * `ApplyColumnarRulesAndInsertTransitions`.
  */
object StripTrueRuntimeFilters extends ColumnarRule {
  override def preColumnarTransitions: Rule[SparkPlan] = StripRule

  private def isAlwaysTrue(e: Expression): Boolean = e match {
    case DynamicPruningExpression(Literal(true, BooleanType)) => true
    case _ => false
  }

  private object StripRule extends Rule[SparkPlan] {
    override def apply(plan: SparkPlan): SparkPlan = plan.transform {
      case b: BatchScanExec if b.runtimeFilters.exists(isAlwaysTrue) =>
        b.copy(runtimeFilters = b.runtimeFilters.filterNot(isAlwaysTrue))
    }
  }
}
