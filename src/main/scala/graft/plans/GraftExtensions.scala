package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Or
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom logical optimization registered through SparkSessionExtensions —
  * the Spark-native counterpart of the reference's custom `OptimizerRule`
  * surface (datafusion/optimizer/src/optimizer.rs; SURVEY.md §2.10).
  *
  * The rule itself ports the reference's `unions_to_filter` optimization
  * (optimizer/src/unions_to_filter.rs): UNION ALL branches that scan the
  * same source with different predicates collapse into one scan with an
  * OR-ed predicate — one pass over the data instead of N.
  */
object UnionsToFilter extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u @ Union(children, false, false) if children.length >= 2 =>
      children match {
        case Seq(Filter(c1, child1), Filter(c2, child2))
            if child1.sameResult(child2) =>
          Filter(Or(c1, c2), child1)
        case _ => u
      }
  }
}

/** Entry point: SparkSession.builder().withExtensions(new GraftExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => UnionsToFilter)
  }
}
