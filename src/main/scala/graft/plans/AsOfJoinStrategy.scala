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

  /** Floating-point anywhere in a key's type forces the MERGE exec:
    * the broadcast exec matches keys by raw UnsafeRow bytes, where
    * -0.0 != 0.0 and NaN bit patterns differ, while the merge exec's
    * interpreted ordering uses SQL float semantics (-0.0 == 0.0, one
    * NaN) — and Catalyst's NormalizeFloatingNumbers rule only guards
    * real Join nodes, never this custom plan. Routing float keys to
    * the merge exec keeps one answer regardless of build-side size;
    * float-keyed as-of joins are rare enough that the lost broadcast
    * is the right price for never diverging.
    */
  private def floatKeyed(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.types._
    def hasFloat(dt: DataType): Boolean = dt match {
      case FloatType | DoubleType => true
      case s: StructType => s.fields.exists(f => hasFloat(f.dataType))
      case a: ArrayType => hasFloat(a.elementType)
      case m: MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
      case _ => false
    }
    hasFloat(e.dataType)
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, vals, strat) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val buildSize = r.stats.sizeInBytes
      if (threshold > 0 && buildSize >= 0 && buildSize <= threshold &&
          !(lk ++ rk).exists(floatKeyed))
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
