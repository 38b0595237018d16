package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Approx mode: rewrite exact `count(DISTINCT x)` into HLL++
  * (`approx_count_distinct`) when `spark.graft.approxCountDistinct` is
  * set — the BigQuery `APPROX_COUNT_DISTINCT` switch as an optimizer
  * rule.
  *
  * Why this is a plan rewrite and not a helper function: at 100 TB an
  * exact distinct count shuffles every distinct key (the distinct-agg
  * Expand doubles the mapped rows first); the HLL++ rewrite shuffles one
  * constant-size sketch per partition per group. Flipping one conf turns
  * every count-distinct in every existing query into the sketch form —
  * no query rewrites, and flipping it back restores exactness.
  *
  * Scope guards: only single-argument COUNT(DISTINCT x) without a FILTER
  * clause is rewritten (multi-arg distinct tuples and filtered aggs keep
  * exact semantics); rsd comes from `spark.graft.approxCountDistinct.rsd`
  * (default 0.05, the same default as `approx_count_distinct`).
  */
object ApproxCountDistinctRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.approxCountDistinct"
  val RsdKey     = "spark.graft.approxCountDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = SQLConf.get
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val rsd = conf.getConfString(RsdKey, "0.05").toDouble
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, None, _)
              if c.children.lengthCompare(1) == 0 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(c.children.head, rsd),
              isDistinct = false)
        }
    }
  }
}
