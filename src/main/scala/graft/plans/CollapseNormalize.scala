package graft.plans

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.TrimNonAlpha

/** Optimizer rule: collapse repeated applications of the portable
  * normalizer — `graft_normalize` is idempotent (lowercasing an already-
  * lowercase string and trimming an already-trimmed string are no-ops), so
  * nested calls reduce to one. Layered pipelines produce this shape when a
  * pre-normalized column is normalized again defensively; each collapsed
  * call saves a lowercase + scan per token at the corpus scale where it
  * matters. Injected by [[graft.GraftExtensions]].
  */
object CollapseNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case TrimNonAlpha(Lower(TrimNonAlpha(inner @ Lower(_)))) => TrimNonAlpha(inner)
    case TrimNonAlpha(TrimNonAlpha(e))                       => TrimNonAlpha(e)
  }
}
