package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution shape (click within N
  * minutes of its impression), state-bounded on BOTH sides by watermarks:
  * the range condition tells Spark how long an impression can still match
  * (watermark + window) and when a click is too late, so join state is
  * evicted instead of growing forever. Left-outer emits the unmatched
  * impression (null click columns) only once its watermark passes the
  * window end — the streaming analog of the batch [[graft.ops.RangeJoin]].
  */
object StreamingJoin {

  /** @param impressions streaming frame with (imp_id, imp_ts, ...)
    * @param clicks      streaming frame with (click_imp_id, click_ts, ...)
    * @param window      attribution window (SQL interval body, e.g. "10 minutes")
    */
  def attributedClicks(
      impressions: DataFrame,
      clicks: DataFrame,
      window: String = "10 minutes",
      watermarkDelay: String = "10 minutes",
      joinType: String = "leftOuter"): DataFrame =
    impressions.withWatermark("imp_ts", watermarkDelay)
      .join(
        clicks.withWatermark("click_ts", watermarkDelay),
        expr(s"""imp_id = click_imp_id
                |AND click_ts >= imp_ts
                |AND click_ts <= imp_ts + interval $window""".stripMargin),
        joinType)
}
