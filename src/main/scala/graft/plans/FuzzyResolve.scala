package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.repair.SequenceMatcher

/** Analyzer-level fallback for the reference's fuzzy identifier repair
  * (SURVEY.md §4.3 item 2): where the text-level pass (SqlRepair P17) fixes
  * SQL before parsing, this rule catches what survives to analysis — any
  * still-unresolved single-part attribute is rewritten to the closest
  * in-scope column at Ratcliff-Obershelp ratio ≥ 0.86 and handed back to
  * the normal resolver.
  *
  * Injected via SparkSessionExtensions.injectResolutionRule, so it runs
  * inside the analyzer's fixed-point batch: the rewrite only ever fires
  * when standard resolution has already failed for that attribute, and
  * resolution correctness is otherwise untouched.
  */
object FuzzyResolveColumns extends Rule[LogicalPlan] {

  private val cutoff = 0.86

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case q if q.childrenResolved && !q.resolved =>
        val inScope = q.children.flatMap(_.output.map(_.name)).distinct
        if (inScope.isEmpty) q
        else q.transformExpressions {
          case ua: UnresolvedAttribute
              if ua.nameParts.size == 1 &&
                !inScope.exists(_.equalsIgnoreCase(ua.name)) =>
            SequenceMatcher.closestMatch(ua.name, inScope, cutoff)
              .map(fixed => UnresolvedAttribute(Seq(fixed)))
              .getOrElse(ua)
        }
    }
}

/** Session extension installing the graft Catalyst customizations:
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => FuzzyResolveColumns)
    e.injectPlannerStrategy(_ => AsOfStrategy)
  }
}
