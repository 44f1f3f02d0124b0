package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BaseOrdering, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical as-of join for a SMALL build side: the build rows ship as one
  * broadcast and the probe side is joined MAP-ONLY — no shuffle, no sort,
  * no repartitioning of the (typically enormous) probe stream. This is
  * the as-of analogue of BroadcastHashJoin, and the right plan whenever
  * the time series being probed is dimension-sized (an item-price
  * history, a config changelog) while the probe side is the 100 TB fact
  * stream: [[AsOfJoinExec]]'s co-partitioned merge would shuffle BOTH
  * sides on the key, paying the full exchange of the fact table for a
  * build side that fits in memory.
  *
  * Each TASK indexes the broadcast array on entry (rows grouped by key
  * into time-sorted arrays — deliberately rebuilt per partition rather
  * than cached per executor: the broadcast threshold bounds the build to
  * a few ms, and holding no cross-partition cache means no
  * session-lifetime storage to leak; see the companion's note). Each
  * probe row then costs one hash lookup + one binary search. Match
  * semantics are bit-compatible with
  * [[AsOfJoinExec]] (backward = last build row with time <= probe,
  * forward = first strictly after, backward_then_forward = per-column
  * coalesce), sharing [[AsOfJoinPlan]]'s null ordering (null times sort
  * first, null keys group together).
  */
case class BroadcastAsOfJoinExec(
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

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // Probe rows pass through untouched and in their incoming order.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val (wantBack, wantFwd, backThenFwd) = AsOfJoinPlan.strategyFlags(strategy)
    val nVals = rightValues.length
    val valTypes = rightValues.map(_.dataType).toArray
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val rightOutput = right.output
    val rightKeyExprs = rightKeys
    val rightTimeExpr = rightTime
    val rightValAttrs = rightValues

    left.execute().mapPartitions({ probeIter =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val keyOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd: BaseOrdering = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val index = BroadcastAsOfJoinExec.index(bcast.value, rightOutput,
        rightKeyExprs, rightTimeExpr, rightValAttrs, timeOrd)
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val outVals = new GenericInternalRow(nVals)

      probeIter.map { l =>
        val group = index.get(lKeyProj(l))
        var back: UnsafeRow = null
        var fwd: UnsafeRow = null
        if (group != null) {
          val lt = lTimeProj(l)
          // Upper bound: number of build times <= probe time.
          var lo = 0; var hi = group.times.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (timeOrd.compare(group.times(mid), lt) <= 0) lo = mid + 1
            else hi = mid
          }
          if (wantBack && lo > 0) back = group.vals(lo - 1)
          if (wantFwd && lo < group.times.length) fwd = group.vals(lo)
        }
        AsOfJoinPlan.mergeValues(back, fwd, backThenFwd, valTypes, outVals)
        numOutputRows += 1
        outProj(joined(l, outVals))
      }
    }, preservesPartitioning = true)
  }
}

object BroadcastAsOfJoinExec {

  /** One key group: build times and value projections, time-ascending. */
  final class Group(val times: Array[UnsafeRow], val vals: Array[UnsafeRow])

  /** Build the key → time-sorted group index from the broadcast rows.
    * Rebuilt per partition — the broadcast threshold bounds the array, so
    * the build is a few ms, and holding no cross-partition cache means no
    * session-lifetime storage to leak (the round's hard-won lesson).
    */
  private[plans] def index(
      rows: Array[InternalRow],
      rightOutput: Seq[Attribute],
      rightKeys: Seq[Expression],
      rightTime: Expression,
      rightValues: Seq[Attribute],
      timeOrd: BaseOrdering): java.util.HashMap[UnsafeRow, Group] = {
    val kProj = UnsafeProjection.create(rightKeys, rightOutput)
    val tProj = UnsafeProjection.create(Seq(rightTime), rightOutput)
    val vProj = UnsafeProjection.create(rightValues.asInstanceOf[Seq[Expression]], rightOutput)
    val byKey = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]]()
    rows.foreach { r =>
      val k = kProj(r).copy()
      var buf = byKey.get(k)
      if (buf == null) {
        buf = scala.collection.mutable.ArrayBuffer.empty[(UnsafeRow, UnsafeRow)]
        byKey.put(k, buf)
      }
      buf += ((tProj(r).copy(), vProj(r).copy()))
    }
    val out = new java.util.HashMap[UnsafeRow, Group](byKey.size())
    byKey.forEach { (k, buf) =>
      // Stable sort by time only: equal-time rows keep broadcast order,
      // matching the merge exec's sort-stability profile.
      val sorted = buf.sortWith((a, b) => timeOrd.compare(a._1, b._1) < 0)
      out.put(k, new Group(sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    out
  }
}
