package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM change-point monitor — the continuous twin of
  * [[graft.ops.TimeSeries.cusum]], with EXACT batch parity: the batch
  * operator computes Page's statistics through the cumsum/running-extremum
  * closed form, and this one carries precisely those three integers
  * (c = Σd, running min c, running max c) as per-key state, so an
  * in-order stream produces bit-identical (cusum_high, cusum_low, alarm)
  * rows to the batch form over the same prefix — the property
  * StreamingCusumSpec pins with a shared fixture.
  *
  * State is THREE longs per key, O(keys) total, watermark-free — the same
  * bounded-state discipline as [[StreamingAnomaly]] (whose z-scores flag
  * spikes; CUSUM accumulates small sustained shifts a z-score never
  * trips on). Within a micro-batch events process in ascending (t, value)
  * order so replays are deterministic.
  */
object StreamingCusum {

  case class Obs(key: String, t: Long, value: Long)

  /** (cumulative deviation, its running min, its running max). */
  case class CusumState(c: Long, lo: Long, hi: Long)

  case class Point(key: String, t: Long, cusum_high: Long, cusum_low: Long,
    alarm: Boolean)

  /** Emit one (key, t, cusum_high, cusum_low, alarm) row per observation,
    * deviations taken against `target`, alarms past `threshold` — same
    * contract as the batch operator.
    */
  def monitor(events: DataFrame, target: Long, threshold: Long): Dataset[Point] = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val spark = events.sparkSession
    import spark.implicits._
    events.select("key", "t", "value").as[Obs]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update(target, threshold))
  }

  private def update(target: Long, threshold: Long)(
      key: String,
      events: Iterator[Obs],
      state: GroupState[CusumState]): Iterator[Point] = {
    // First observation must see lo = hi = c after its own fold, which the
    // closed form produces naturally when starting from c=0 with min/max
    // folded AFTER the sum update (matching the window's inclusive frame).
    var s = state.getOption.getOrElse(CusumState(0L, Long.MaxValue, Long.MinValue))
    val out = Seq.newBuilder[Point]
    events.toArray.sortBy(e => (e.t, e.value)).foreach { e =>
      val c = s.c + (e.value - target)
      val lo = math.min(if (s.lo == Long.MaxValue) c else s.lo, c)
      val hi = math.max(if (s.hi == Long.MinValue) c else s.hi, c)
      s = CusumState(c, lo, hi)
      val high = c - math.min(0L, lo)
      val low = math.max(0L, hi) - c
      out += Point(key, e.t, high, low, high > threshold || low > threshold)
    }
    state.update(s)
    out.result().iterator
  }
}
