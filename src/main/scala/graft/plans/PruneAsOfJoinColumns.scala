package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning through [[AsOfJoinPlan]] — the other optimization
  * Catalyst cannot apply to a node it does not know: a projection after
  * the join that uses a few columns still paid to carry EVERY probe
  * column and EVERY declared build value through the join's shuffles and
  * sorts. At 100 TB the probe side is the fact stream; dropping unused
  * fact columns before the exchange is the difference between shuffling
  * two slim columns and shuffling the table.
  *
  * Rewrite: for `Project(p, asof)` where `p` needs only a subset of the
  * join's output, narrow the probe child to (needed probe attrs ∪ key/
  * time refs), narrow the build child to (key/time refs ∪ surviving
  * values), and drop unreferenced `rightValues`. The projection stays on
  * top; fires only when it actually removes a column, so the fixed point
  * terminates.
  */
object PruneAsOfJoinColumns extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinPlan) =>
      pruneOne(projList, j, extraNeeded = AttributeSet.empty)
        .getOrElse(p)
    // The SQL inner-as-of rewrite emits Project(Filter(match-indicator),
    // node); the filter's references (the indicator) must survive the
    // prune alongside the projection's.
    case p @ Project(projList, f @ Filter(cond, j: AsOfJoinPlan)) =>
      pruneOne(projList, j, extraNeeded = cond.references).map {
        case Project(pl, newJoin) => Project(pl, f.copy(child = newJoin))
        case other => other
      }.getOrElse(p)
    // Same shape with the rewrite's output-restoring projection in
    // between (the user's SELECT sits above it; Catalyst's own
    // CollapseProject ran before the user batch and will not return).
    // The inner list is pure attributes, so the outer list's references
    // resolve identically without it — collapse and prune in one step.
    case p @ Project(outer, Project(inner, f @ Filter(cond, j: AsOfJoinPlan)))
        if inner.forall(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.AttributeReference]) =>
      pruneOne(outer, j, extraNeeded = cond.references).map {
        case Project(pl, newJoin) => Project(pl, f.copy(child = newJoin))
        case other => other
      }.getOrElse(p)
  }

  private def pruneOne(
      projList: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      j: AsOfJoinPlan,
      extraNeeded: AttributeSet): Option[Project] = {
    val needed = AttributeSet(projList.flatMap(_.references)) ++ extraNeeded

    val leftRequired = j.left.output.filter(a =>
        needed.contains(a) ||
          j.leftKeys.exists(_.references.contains(a)) ||
          j.leftTime.references.contains(a))
      val keptValues = j.rightValues.filter(needed.contains)
      val rightRequired = j.right.output.filter(a =>
        j.rightKeys.exists(_.references.contains(a)) ||
          j.rightTime.references.contains(a) ||
          keptValues.exists(_.exprId == a.exprId))

      val prunesLeft = leftRequired.length < j.left.output.length
      val prunesRight = rightRequired.length < j.right.output.length ||
        keptValues.length < j.rightValues.length
      if (!prunesLeft && !prunesRight) None
      else {
        val newJoin = j.copy(
          left = if (prunesLeft) Project(leftRequired, j.left) else j.left,
          right = if (prunesRight) Project(rightRequired, j.right) else j.right,
          rightValues = keptValues)
        Some(Project(projList, newJoin))
      }
  }
}
