package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through [[AsOfJoinPlan]] — the optimizer support a
  * custom logical operator must supply itself: Catalyst's own
  * PushDownPredicate knows nothing about the node, so without this rule a
  * probe-side filter written after the join runs AFTER the join's
  * shuffle+sort, paying the full as-of merge for rows the query then
  * drops.
  *
  * Safe because the as-of join emits EXACTLY one output row per probe
  * row (left-outer semantics, no expansion or dedup) and passes probe
  * attributes through unchanged, so a deterministic predicate over probe
  * attributes selects the same rows on either side of the join. Each
  * conjunct is pushed independently; conjuncts touching build-side
  * values (or non-deterministic ones) stay above.
  *
  * Registered both ways the strategy is: `SparkSessionExtensions
  * .injectOptimizerRule` at session build, `experimental
  * .extraOptimizations` at runtime ([[AsOfJoinStrategy.register]] wires
  * both operators together, so every `joinNative` caller gets the
  * pushdown automatically).
  */
object PushProbeFilterThroughAsOfJoin extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      // Only the DETERMINISTIC PREFIX of the conjunction is a pushdown
      // candidate — Catalyst's own PushPredicateThroughJoin/NonJoin use
      // span(_.deterministic) for the same reason: a deterministic
      // conjunct AFTER a non-deterministic one (rand() < 0.5 && t < 50)
      // must not move below it, or the non-deterministic expression's
      // per-partition draw sequence is consumed by a different row
      // stream than the unoptimized plan and the surviving row set
      // changes.
      val (prefix, _) = conjuncts(cond).span(_.deterministic)
      val push = prefix.filter(_.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val keep = conjuncts(cond).filterNot(push.contains)
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
