package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BaseOrdering, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical as-of join: co-partitioned, co-sorted streaming merge.
  *
  * EnsureRequirements supplies one hash shuffle per side on the join keys
  * (`requiredChildDistribution`) and one in-partition sort per side on
  * (keys, time) (`requiredChildOrdering`) — the same machinery that feeds
  * SortMergeJoin, so AQE, reused exchanges, and skew handling all apply.
  * The merge itself is a single forward pass over both iterators:
  *
  *   - build rows are consumed once; only the (key, time, values)
  *     projection of the current backward candidate is retained (one small
  *     row copy per build row — never the full build row, and never more
  *     than one buffered row per side);
  *   - for each probe row the backward candidate is the last build row with
  *     `time <= probeTime` in the same key group, and the forward candidate
  *     is the build iterator's current head if it is still in the group;
  *   - output rows are emitted in probe order, so `outputOrdering` is
  *     preserved for downstream operators.
  *
  * Memory is O(1) per partition beyond the sorter: a skewed hot key costs
  * one partition's external sort (same profile as SMJ) — never a buffered
  * key group, unlike a `mapGroups` formulation.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    strategy: String)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // Keyless as-of (a single global time axis) must see BOTH sides whole:
  // AllTuples collapses each side to one partition so the zipPartitions
  // merge is total. Unspecified would zip unrelated partition pairs — wrong
  // results when counts happen to match, a runtime throw when they don't.
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    AsOfJoinPlan.ordering(leftKeys, leftTime),
    AsOfJoinPlan.ordering(rightKeys, rightTime))

  // Probe rows pass through untouched and in order.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = AsOfJoinPlan.ordering(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val (wantBack, wantFwd, backThenFwd) = AsOfJoinPlan.strategyFlags(strategy)
    val nVals = rightValues.length
    val valTypes = rightValues.map(_.dataType).toArray

    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val rValsProj = UnsafeProjection.create(rightValues.asInstanceOf[Seq[Expression]], right.output)
      val keyOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // Bind the value side at nullable=true (i.e. against `output`, not
      // `rightValues`): no-match rows carry genuine nulls.
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val outVals = new GenericInternalRow(nVals)

      new Iterator[InternalRow] {
        // Current build head, held as small projected copies (key/time/vals).
        private var rHave = false
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        private var rVals: UnsafeRow = _
        // Backward candidate's values + the key group it belongs to.
        private var backVals: UnsafeRow = _
        private var ctxKey: UnsafeRow = _

        advanceBuild()

        private def advanceBuild(): Unit = {
          if (buildIter.hasNext) {
            val r = buildIter.next()
            rKey = rKeyProj(r).copy()
            rTime = rTimeProj(r).copy()
            rVals = rValsProj(r).copy()
            rHave = true
          } else rHave = false
        }

        override def hasNext: Boolean = probeIter.hasNext

        override def next(): InternalRow = {
          val l = probeIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)

          // New probe key group → the retained backward candidate is stale.
          if (ctxKey == null || keyOrd.compare(ctxKey, lk) != 0) {
            backVals = null
            ctxKey = lk.copy()
          }
          // Skip build keys no probe will ever ask for again (probes ascend).
          while (rHave && keyOrd.compare(rKey, lk) < 0) advanceBuild()
          // Consume the backward frame: same key, time <= probe time. Later
          // probes in this group have >= time, so consuming is safe.
          while (rHave && keyOrd.compare(rKey, lk) == 0 &&
              timeOrd.compare(rTime, lt) <= 0) {
            backVals = rVals
            advanceBuild()
          }
          // Head is now the first build row strictly after the probe (or a
          // later key): the forward candidate iff it is still in the group.
          val fwdVals: UnsafeRow =
            if (wantFwd && rHave && keyOrd.compare(rKey, lk) == 0) rVals else null
          val back: UnsafeRow = if (wantBack) backVals else null

          AsOfJoinPlan.mergeValues(back, fwdVals, backThenFwd, valTypes, outVals)
          numOutputRows += 1
          outProj(joined(l, outVals))
        }
      }
    }
  }
}
