package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Conf-gated optimizer rule: rewrite exact COUNT(DISTINCT x) into
  * HyperLogLog++ approx_count_distinct.
  *
  * Why: on a 100 TB fact table an exact distinct count forces an extra
  * shuffle keyed by (group, x) to dedupe before counting; HLL++ is a single
  * partial-aggregatable sketch (one shuffle, constant memory per group).
  * Dashboards/report-prep (the reference's Dynamic Reports use case) rarely
  * need exactness — opt in per session with
  * `SET spark.graft.approxDistinct.enabled=true`, rsd via
  * `spark.graft.approxDistinct.rsd` (default 0.05).
  */
case class ApproxDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approxDistinct.enabled").contains("true")
  private def rsd: Double =
    spark.conf.getOption("spark.graft.approxDistinct.rsd").map(_.toDouble).getOrElse(0.05)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(children), _, true, _, _) if children.size == 1 =>
        ae.copy(
          aggregateFunction = HyperLogLogPlusPlus(children.head, rsd),
          isDistinct = false)
    }
  }
}
