package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Plan-assertion helper: AQE wraps the physical plan in
  * `AdaptiveSparkPlanExec`/`QueryStageExec` nodes whose inner plans are
  * NOT `children`, so `TreeNode.collect` never sees the real operators.
  * This flattens through those wrappers (using the current adaptive
  * plan, final if the query already ran).
  */
object PlanTestHelpers {

  def flattenPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flattenPlan(a.executedPlan)
    case q: QueryStageExec => p +: flattenPlan(q.plan)
    case _ => p +: p.children.flatMap(flattenPlan)
  }

  def physicalOps(df: DataFrame): Seq[SparkPlan] =
    flattenPlan(df.queryExecution.executedPlan)
}
