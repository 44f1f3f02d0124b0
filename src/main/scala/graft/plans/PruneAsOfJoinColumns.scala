package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
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
      val needed = AttributeSet(projList.flatMap(_.references))

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
      if (!prunesLeft && !prunesRight) p
      else {
        val newJoin = j.copy(
          left = if (prunesLeft) Project(leftRequired, j.left) else j.left,
          right = if (prunesRight) Project(rightRequired, j.right) else j.right,
          rightValues = keptValues)
        Project(projList, newJoin)
      }
  }
}
