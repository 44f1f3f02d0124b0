package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: one output row per left (probe) row, carrying
  * `rightValues` from the matched right (build) row.
  *
  * Match semantics (mirrors the reference's 3-probe price lookup,
  * `/root/reference/src/2_parse_engine.py:16-63`, and DuckDB's row-atomic
  * `ASOF JOIN`):
  *
  *   - backward: the right row with the greatest `rightTime <= leftTime`
  *     for the same key (exact-time match included);
  *   - forward: the right row with the least `rightTime > leftTime`;
  *   - backward_then_forward: per VALUE COLUMN,
  *     `coalesce(backwardRow(col), forwardRow(col))` — exactly the oracle's
  *     two-ASOF-then-COALESCE formulation (IngestQueries `q_asof_price`).
  *
  * Null keys group together (as the library-level union+window form does via
  * `Window.partitionBy`); null times sort first, Spark's default ascending
  * order, identically in both formulations.
  *
  * This node exists so the as-of join can be planned as a true co-partitioned
  * sort-merge ([[AsOfJoinExec]]): one shuffle per side on the key, one
  * in-partition sort per side, then a streaming O(left+right) merge with O(1)
  * state per key — instead of the union+window form, which funnels BOTH
  * inputs through a single union-wide sort and carries every probe column
  * through the window stage. At 100 TB the merge halves the sorted bytes
  * (each side sorts only itself) and never widens rows with null-padded
  * columns from the other side.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    strategy: String)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length, "key arity mismatch")
  require(AsOfJoinPlan.Strategies.contains(strategy), s"unknown strategy $strategy")

  // Right-side values are nullable in the output: a key with no build rows
  // yields nulls, as a left outer join would.
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  val Strategies: Set[String] = Set("backward", "forward", "backward_then_forward")

  /** Sort order both planner and executor agree on: (keys..., time) asc. */
  def ordering(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    (keys :+ time).map(SortOrder(_, Ascending))
}
