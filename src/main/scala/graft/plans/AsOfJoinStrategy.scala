package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans [[AsOfJoinPlan]] physically, choosing by build-side size exactly
  * as Spark's JoinSelection does for equi-joins:
  *
  *   - build side's estimated size within `spark.sql.autoBroadcastJoinThreshold`
  *     → [[BroadcastAsOfJoinExec]]: probe side stays map-only, ZERO
  *     shuffles (the win when a 100 TB fact stream probes a
  *     dimension-sized time series);
  *   - otherwise → [[AsOfJoinExec]]: co-partitioned, co-sorted streaming
  *     merge (both sides shuffle once on the key).
  *
  * Injected at session build via `graft.GraftExtensions`
  * (spark.sql.extensions) or at runtime through
  * [[AsOfJoinStrategy.register]].
  */
object AsOfJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, vals, strat) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val buildSize = r.stats.sizeInBytes
      if (threshold > 0 && buildSize >= 0 && buildSize <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          vals, strat) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, vals,
          strat) :: Nil
    case _ => Nil
  }

  /** Idempotently add the strategy AND its pushdown rule to an
    * already-built session (the two travel together: planning the node
    * without probe-filter pushdown leaves easy shuffle savings behind).
    */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
    // Order matters: the SQL-marker rewrite must precede pushdown/pruning
    // so they see the AsOfJoinPlan it produces within the same batch.
    Seq(RewriteAsOfTimeJoin, PushProbeFilterThroughAsOfJoin,
      PruneAsOfJoinColumns).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
      }
    }
  }
}
