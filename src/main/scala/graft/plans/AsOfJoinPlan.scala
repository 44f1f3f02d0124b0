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
  // Type equality is REQUIRED, not coerced: the execs build orderings
  // and unsafe projections from the LEFT side's types and apply them to
  // rows projected with the RIGHT side's — an int-vs-bigint drift would
  // compare raw bytes of different widths and silently mis-match (the
  // SQL path is protected by the analyzer's coercion; the joinNative /
  // direct-construction path lands here). Callers cast explicitly.
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(org.apache.spark.sql.types.DataType.equalsStructurally(
        l.dataType, r.dataType, ignoreNullability = true),
      s"as-of key type mismatch: ${l.dataType} vs ${r.dataType} — cast " +
        "the sides to a common type first")
  }
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"as-of time type mismatch: ${leftTime.dataType} vs " +
      s"${rightTime.dataType} — cast the sides to a common type first")

  // Right-side values are nullable in the output: a key with no build rows
  // yields nulls, as a left outer join would.
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // One output row per PROBE row — without this Catalyst's default
  // binary-node visitor estimates sizeInBytes as the PRODUCT of the
  // children (1 GB ⋈ 1 GB ≈ 1 EB), disqualifying every operator above
  // the as-of join from static broadcast planning. Cardinality = left's;
  // bytes scale by the widened row — weighted by the columns' DEFAULT
  // BYTE WIDTHS (the EstimationUtils convention), not the column count:
  // a (long, long) probe carrying one ~1 KB string value widens ~65×,
  // and a count-based 1.5× there would let a parent join broadcast
  // hundreds of real megabytes.
  override def stats: org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    val l = left.stats
    val bytesL = math.max(1, left.output.map(_.dataType.defaultSize).sum)
    val bytesOut = bytesL + rightValues.map(_.dataType.defaultSize).sum
    val factor = bytesOut.toDouble / bytesL
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = (BigDecimal(l.sizeInBytes) * factor).toBigInt.max(1),
      rowCount = l.rowCount)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  val Strategies: Set[String] = Set("backward", "forward", "backward_then_forward")

  /** Sort order both planner and executor agree on: (keys..., time) asc. */
  def ordering(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    (keys :+ time).map(SortOrder(_, Ascending))

  /** Strategy flags (wantBack, wantFwd, backThenFwd): ONE derivation for
    * both execs — the merge and broadcast paths are contractually
    * bit-compatible, so the flag logic must have a single home.
    */
  def strategyFlags(strategy: String): (Boolean, Boolean, Boolean) =
    (strategy != "forward", strategy != "backward",
      strategy == "backward_then_forward")

  /** The shared per-column value merge both execs run per probe row:
    * backward's value; else forward's — taken when no backward row
    * matched at all OR the strategy coalesces per column; else null.
    * Writes into `outVals` (reused across rows by the caller).
    */
  def mergeValues(
      back: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      fwd: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      backThenFwd: Boolean,
      valTypes: Array[org.apache.spark.sql.types.DataType],
      outVals: org.apache.spark.sql.catalyst.expressions.GenericInternalRow)
      : Unit = {
    var i = 0
    while (i < valTypes.length) {
      val v =
        if (back != null && !back.isNullAt(i)) back.get(i, valTypes(i))
        else if (fwd != null && (back == null || backThenFwd) &&
            !fwd.isNullAt(i)) fwd.get(i, valTypes(i))
        else null
      outVals.update(i, v)
      i += 1
    }
  }
}
