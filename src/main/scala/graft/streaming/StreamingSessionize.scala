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
    // Guard at construction: a non-positive gap would set a state
    // timeout at/behind the current watermark — an
    // IllegalArgumentException inside the RUNNING streaming query (the
    // StreamingNearDedup stateTtlMs lesson), or degenerate zero-length
    // sessions.
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
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
    // in memory (bounded by the micro-batch), so merge locally with the
    // same chain sweep the batch sessionizer performs: the in-flight state
    // and each event are intervals, sorted by start, and adjacent intervals
    // within the gap chain into one session. This keeps batch/streaming
    // parity even for cross-batch stragglers — two stragglers each > gap
    // older than the in-flight session but within gap of EACH OTHER chain
    // into one session, and a straggler chain that reaches within gap of
    // the in-flight session bridges into it (events later than the
    // watermark only; truly late data is dropped upstream by the
    // watermark, as in any streaming engine).
    val intervals = state.getOption.toSeq ++
      events.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1))
    val closed = Seq.newBuilder[ClosedSession]
    var cur: Option[SessionState] = None
    intervals.sortBy(_.startMs).foreach { iv =>
      cur match {
        case Some(s) if iv.startMs - s.lastMs > gapMs =>
          closed += close(userId, s)
          cur = Some(iv)
        case Some(s) =>
          cur = Some(SessionState(s.startMs, math.max(s.lastMs, iv.lastMs), s.n + iv.n))
        case None =>
          cur = Some(iv)
      }
    }
    // Chains are disjoint and start-ordered, so the last one has the
    // latest end: it stays in flight; everything before it is closed
    // relative to the watermark contract — a future event above the
    // watermark but within gap of an emitted chain WOULD have extended it
    // under batch semantics, and append output cannot retract. That
    // residual divergence is inherent to append-mode sessionization; the
    // watermark bounds how old such an event can be.
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + gapMs)
    }
    closed.result().iterator
  }

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
}
