package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Injected at session build via
  * `graft.GraftExtensions` (spark.sql.extensions) or at runtime through
  * [[AsOfJoinStrategy.register]].
  */
object AsOfJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, vals, strat) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, vals, strat) :: Nil
    case _ => Nil
  }

  /** Idempotently add the strategy to an already-built session. */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }
}
