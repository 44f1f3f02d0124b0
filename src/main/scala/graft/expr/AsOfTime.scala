package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** SQL surface for the native as-of join: a join-condition marker.
  *
  *   SELECT ... FROM probes p LEFT JOIN build b             -- ASOF LEFT
  *     ON p.key = b.key AND asof_time(p.ts, b.ts)           -- backward
  *   -- plain JOIN = inner (unmatched probes dropped, DuckDB ASOF JOIN);
  *   -- or asof_time(p.ts, b.ts, 'backward_then_forward')
  *
  * [[graft.plans.RewriteAsOfTimeJoin]] rewrites any inner/left join
  * whose condition carries exactly one `asof_time` conjunct into
  * [[graft.plans.AsOfJoinPlan]] — the same node the Scala
  * `AsOfJoin.joinNative` path plans into the co-partitioned streaming
  * merge or broadcast-index exec. Matching DuckDB/pandas `merge_asof`
  * convention, the default strategy is `backward` (latest build time <=
  * probe time); `forward` and the reference's `backward_then_forward`
  * are selectable by literal.
  *
  * The marker deliberately references BOTH sides, so predicate pushdown
  * cannot strand it on one side before the rewrite runs; it is never
  * meant to be evaluated — reaching eval/codegen means the rewrite rule
  * is not installed, and the query fails loudly instead of silently
  * running a many-to-many range join.
  */
case class AsOfTime(probeTime: Expression, buildTime: Expression,
    strategy: String) extends Expression {

  override def children: Seq[Expression] = Seq(probeTime, buildTime)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!graft.plans.AsOfJoinPlan.Strategies.contains(strategy))
      TypeCheckResult.TypeCheckFailure(
        s"asof_time strategy '$strategy' is not one of " +
          graft.plans.AsOfJoinPlan.Strategies.toSeq.sorted.mkString(", "))
    else if (probeTime.dataType != buildTime.dataType)
      TypeCheckResult.TypeCheckFailure(
        s"asof_time sides must share a type, got ${probeTime.dataType} " +
          s"vs ${buildTime.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  private def installHint: Nothing = throw new IllegalStateException(
    "asof_time(...) is a join-condition marker, not an evaluable " +
      "predicate. Install graft's optimizer rules first: " +
      "graft.plans.AsOfJoinStrategy.register(spark) or " +
      "spark.sql.extensions=graft.GraftExtensions")

  override def eval(input: InternalRow): Any = installHint

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = installHint

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfTime =
    copy(probeTime = newChildren(0), buildTime = newChildren(1))
}
