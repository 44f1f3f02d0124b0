package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — "did the user view, THEN click, THEN
  * purchase, and how long did conversion take?" — the sequential-pattern
  * reduction every product-analytics engine ships (and, over training
  * telemetry, the same shape as multi-stage pipeline-progress tracking).
  *
  * Semantics: events sort per user by (`tsCol`, `tieCols`...) — the tie
  * columns make the order TOTAL, so reruns agree on simultaneous events.
  * Stage k's time is the earliest event matching `stages(k)` that comes
  * strictly after some event already satisfying stage k-1 (the classic
  * unordered-window funnel; no time-boxing — compose with a time filter
  * upstream for windowed funnels).
  *
  * Shape (the 100 TB argument): ONE hash shuffle on the user key and ONE
  * in-partition sort; every stage is a layered window expression over the
  * SAME window spec, so Catalyst stacks them as consecutive Window
  * operators reusing the sort — no join per stage, no re-shuffle, and the
  * final per-user reduction partially aggregates. A hot user costs one
  * partition's sort of their own events, nothing cross-user.
  */
object Funnel {

  /** @param stages ordered stage predicates over the event row
    * @return per user: `steps_completed` (0..stages.length), `t_first_us`
    *         (epoch µs of the first stage-0 event, null if none) and
    *         `t_convert_us` (epoch µs of full completion, null otherwise)
    */
  def steps(events: DataFrame, userCol: String, tsCol: String,
      tieCols: Seq[String], stages: Seq[Column]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val wPrev = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieCols.map(col)).toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, -1)

    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (pred, i)) =>
      val qual =
        if (i == 0) when(pred, col(tsCol))
        else when(pred && count(col(s"__q${i - 1}")).over(wPrev) > 0, col(tsCol))
      df.withColumn(s"__q$i", qual)
    }

    val mins = stages.indices.map(i => min(col(s"__q$i")).as(s"__t$i"))
    val perUser = staged.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)

    // steps_completed = length of the non-null prefix (a later stage can
    // only qualify after an earlier one, so nulls are suffix-closed).
    val steps = stages.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"__t$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    val last = s"__t${stages.length - 1}"
    perUser.select(col(userCol),
      steps.cast("long").as("steps_completed"),
      unix_micros(col("__t0")).as("t_first_us"),
      unix_micros(col(last)).as("t_convert_us"))
  }
}
