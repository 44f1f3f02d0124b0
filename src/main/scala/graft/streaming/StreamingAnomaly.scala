package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly detection with Welford running moments —
  * the continuous twin of the batch outlier query (`q_outliers`): each
  * key carries (n, mean, M2) and every arriving value is scored against
  * the distribution of everything that came BEFORE it, then folded in.
  *
  * Welford's update is the numerically-stable one-pass recurrence
  * (never Σx² − (Σx)²/n, which cancels catastrophically at large n):
  * {{{
  *   n' = n + 1; d = x − mean; mean' = mean + d/n'; M2' = M2 + d·(x − mean')
  * }}}
  * State is THREE doubles per key — O(keys), watermark-free, exactly the
  * bounded-state discipline of [[StreamingFunnel]]. Within a micro-batch
  * events are processed in ascending (ts, value) order so replays are
  * deterministic.
  *
  * Score-then-fold means the first `minN` observations of a key are never
  * flagged (no self-justifying anomalies at cold start), and a genuine
  * level shift flags its FIRST deviant points rather than silently
  * absorbing them into the mean — the property a data-quality monitor
  * actually wants at ingest time.
  */
object StreamingAnomaly {

  case class Obs(key: String, ts: Timestamp, value: Double)

  /** Welford sufficient statistics. */
  case class Moments(n: Long, mean: Double, m2: Double)

  case class Anomaly(key: String, t_us: Long, value: Double, z: Double)

  /** Emit (key, event-time µs, value, z) for every observation whose
    * |z| ≥ `threshold` against the key's PRIOR distribution, once the key
    * has at least `minN` prior observations.
    */
  def detect(events: DataFrame, threshold: Double,
      minN: Long = 10L): Dataset[Anomaly] = {
    require(threshold > 0 && minN >= 2)
    val spark = events.sparkSession
    import spark.implicits._
    events.select("key", "ts", "value").as[Obs]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update(threshold, minN))
  }

  private def update(threshold: Double, minN: Long)(
      key: String,
      events: Iterator[Obs],
      state: GroupState[Moments]): Iterator[Anomaly] = {
    var m = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
    val out = Seq.newBuilder[Anomaly]
    events.toArray.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
      if (m.n >= minN) {
        // A CONSTANT history (m2 == 0) has zero estimated scale: any
        // departure from the constant is maximally anomalous and flags
        // with an infinite z — skipping it instead would absorb the
        // clearest possible level shift into the moments unflagged,
        // exactly the silent-absorption the class contract rules out.
        val z =
          if (m.m2 > 0.0)
            (e.value - m.mean) / math.sqrt(m.m2 / (m.n - 1))
          else if (e.value == m.mean) 0.0
          else if (e.value > m.mean) Double.PositiveInfinity
          else Double.NegativeInfinity
        if (math.abs(z) >= threshold)
          out += Anomaly(key, e.ts.getTime * 1000L, e.value, z)
      }
      val n1 = m.n + 1
      val d = e.value - m.mean
      val mean1 = m.mean + d / n1
      m = Moments(n1, mean1, m.m2 + d * (e.value - mean1))
    }
    state.update(m)
    out.result().iterator
  }
}
