package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization (`flatMapGroupsWithState`): the
  * streaming twin of the batch gap-based sessionizer
  * ([[graft.ops.TimeSeries.sessionize]]) — per-user sessions close when no
  * event arrives within `gapSeconds`.
  *
  * State is one in-flight session per user (start, last-seen, count);
  * closed sessions are APPENDED as soon as a later event proves the gap,
  * and the event-time timeout flushes the final session once the watermark
  * passes `last + gap`. State size is O(active users), not O(events) —
  * the shape that holds on an unbounded stream.
  */
object StreamingSessionize {

  case class SessionEvent(user_id: Long, ts: Timestamp)

  case class SessionState(startMs: Long, lastMs: Long, n: Long)

  case class ClosedSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** `events` must have (user_id: long, ts: timestamp) and a watermark on
    * `ts` (the event-time timeout requires one).
    */
  def sessions(events: DataFrame, gapSeconds: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("user_id", "ts").as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapSeconds * 1000L))
  }

  private def update(gapMs: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // Watermark passed last + gap with no new events: final flush.
      val s = state.get
      state.remove()
      return Iterator.single(close(userId, s))
    }

    // Per-group batch arrivals are unordered; a user's in-flight events fit
    // in memory (bounded by the micro-batch), so sort locally.
    val sorted = events.toArray.sortBy(_.ts.getTime)
    var cur = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs > gapMs =>
          closed += close(userId, s)
          cur = Some(SessionState(t, t, 1))
        case Some(s) if s.startMs - t > gapMs =>
          // Cross-batch straggler older than the in-flight session by more
          // than the gap: its own (already-closed) session, like the batch
          // sessionizer would produce — NOT absorbed into a session whose
          // bounds don't contain it.
          closed += ClosedSession(userId, e.ts, e.ts, 1)
        case Some(s) =>
          // Within the gap on either side: extend the session to cover it.
          cur = Some(SessionState(math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + gapMs)
    }
    closed.result().iterator
  }

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
}
