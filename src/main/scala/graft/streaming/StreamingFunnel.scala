package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression (`mapGroupsWithState`) — the continuous
  * twin of [[graft.ops.Funnel]]: per-user stage state advances as events
  * arrive, and an update is emitted whenever the user's furthest stage
  * changes (append-mode conversions only would hide drop-off; update-mode
  * progression is what a live dashboard plots).
  *
  * Semantic contract with the batch operator: a stage-k event counts only
  * if it is strictly later than the recorded stage-(k-1) time (batch uses
  * full (ts, tie) order; the stream uses event time alone, and processes
  * each micro-batch's events in ascending (ts, stage) order for
  * determinism within a batch). For in-order arrival the reached stages
  * and times equal the batch result exactly; a late-arriving earlier
  * event refines an already-reached stage to its earlier qualifying time,
  * but cannot resurrect a previously discarded candidate (streaming keeps
  * O(#stages) state, not the event log — re-run the batch operator for
  * exact as-of-history numbers).
  *
  * State is O(#stages) longs per user — bounded, watermark-free (a funnel
  * over all time never expires; compose with a TTL timeout upstream for
  * windowed funnels). At 100 TB-equivalent event rates the state store
  * shards by user hash exactly like the batch shuffle.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, ts: Timestamp, stage: Int)

  /** Earliest qualifying event-time per reached stage (µs), prefix-closed. */
  case class FunnelState(stageUs: Seq[Long])

  case class Progress(user_id: Long, steps_completed: Int, t_last_us: Long)

  /** `events`: (user_id, ts, stage) where `stage` is the 0-based stage
    * index of the event (map event predicates to indices upstream).
    * Emits one row per user per micro-batch in which their progress grew.
    */
  def progression(events: DataFrame, nStages: Int): Dataset[Progress] = {
    require(nStages >= 1, "need at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    events.select("user_id", "ts", "stage").as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(update(nStages))
  }

  private def update(nStages: Int)(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[Progress] = {
    val initial = state.getOption.map(_.stageUs).getOrElse(Seq.empty)
    var stages = initial
    // Ascending event-time sweep; a batch's events fit in memory.
    val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.stage))
    sorted.foreach { e =>
      if (e.stage < nStages) {
        val us = e.ts.getTime * 1000L
        if (e.stage == stages.length &&
            (e.stage == 0 || us > stages(e.stage - 1))) {
          stages = stages :+ us
        } else if (e.stage < stages.length &&
            us < stages(e.stage) &&
            (e.stage == 0 || us > stages(e.stage - 1))) {
          // Late event improves an already-reached stage to an earlier
          // qualifying time (batch-min parity). Later stages stay valid:
          // their times are > the old, larger value.
          stages = stages.updated(e.stage, us)
        }
      }
    }
    if (stages != initial) {
      state.update(FunnelState(stages))
    }
    if (stages.length > initial.length)
      Iterator.single(Progress(userId, stages.length, stages.last))
    else Iterator.empty
  }
}
