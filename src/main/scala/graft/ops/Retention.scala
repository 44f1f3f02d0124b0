package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — "of the users first seen in week W, how many were
  * active again k weeks later?" — the second classic event-stream
  * reduction next to [[Funnel]].
  *
  * Shape: first-seen per user is one key-partitioned partial-agg'd
  * aggregation; per-user-per-period activity is a distinct over (user,
  * period) — also key-partitioned; the cohort join is user-keyed (both
  * sides already hash on the user), and the final (cohort, offset) count
  * is a partial-agg'd rollup whose result is #cohorts × #offsets rows —
  * tiny at any corpus size. No windows, no driver-side state.
  *
  * Periods are integer epoch-week indices (`floor(epoch_us / week_us)` on
  * the µs timeline — engine-portable integer arithmetic, no calendar
  * functions whose week-numbering conventions differ across engines).
  */
object Retention {

  private val WeekUs = 7L * 24 * 3600 * 1000000L

  // Integer floor division (timestamps are non-negative): the long→double
  // path of Column./ is exact here but `div` keeps the whole pipeline in
  // integer arithmetic, same discipline as Sharding/PageRank.
  private def periodIdx(ts: Column, periodUs: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumnBridge.expression(unix_micros(ts)),
        GraftColumnBridge.expression(lit(periodUs))))
  }

  /** @return (cohort_period, period_offset, n_users): users first seen in
    *         `cohort_period` that were active `period_offset` periods
    *         later (offset 0 = the cohort size itself).
    */
  def cohorts(events: DataFrame, userCol: String, tsCol: String,
      periodUs: Long = WeekUs): DataFrame = {
    require(periodUs > 0, "period must be positive")
    val activity = events
      .select(col(userCol), periodIdx(col(tsCol), periodUs).as("__p"))
      .distinct()
    val firstSeen = activity.groupBy(col(userCol))
      .agg(min(col("__p")).as("__cohort"))
    activity.join(firstSeen, userCol)
      .groupBy(col("__cohort").as("cohort_period"),
        (col("__p") - col("__cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
