package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tumbling-window time-series with pandas-`resample` parity.
  *
  * Reference semantics (`/root/reference/src/3_transform_data.py:367-386`):
  * bucket events into 6h/daily/weekly windows, aggregate Count + Total_Value,
  * then cumulative-sum within each frequency. pandas `resample` emits EMPTY
  * intermediate buckets (Count=0) so the cumulative series is gap-free;
  * Spark's groupBy only emits non-empty buckets, so we left-join a generated
  * date spine (`sequence` + `explode`) to restore the empty buckets before
  * the cumulative window.
  *
  * Scale notes: the groupBy shuffles once on the bucket key; the spine is
  * generated on the driver-side boundaries (two scalars) and broadcast —
  * its cardinality is (time range / bucket), tiny even at 100 TB of events.
  * The cumulative sums run per-year ([[TimeSeries.gapFreeCumulative]]), so
  * no window ever moves more than one year of buckets to one partition.
  */
object TimeSeries {

  /** Cumulative sums over the (already gap-free) bucket table WITHOUT a
    * single-partition window: a running sum partitioned by `year(dateCol)`
    * plus each year's base offset (the total of all prior years, built by
    * a years×years triangle join over the per-year aggregate — a handful
    * of rows, broadcast back). Bucket rows are one-per-bucket, but at a
    * century of 6h buckets × many frequencies an unpartitioned WindowExec
    * serializes the whole report; this shape never does.
    *
    * `sums` maps source column → cumulative output column. Addition is
    * long/decimal exact, so results are bit-identical to the global
    * ordered window.
    */
  def gapFreeCumulative(full: DataFrame, dateCol: String,
      sums: Seq[(String, String)]): DataFrame = {
    val withYr = full.withColumn("__yr", year(col(dateCol)))
    val wIn = Window.partitionBy("__yr").orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val running = sums.foldLeft(withYr) { case (df, (src, dst)) =>
      df.withColumn(dst, sum(col(src)).over(wIn))
    }
    val totalAggs = sums.map { case (src, dst) => sum(col(src)).as(s"__t_$dst") }
    val yearTotals = withYr.groupBy("__yr")
      .agg(totalAggs.head, totalAggs.tail: _*)
    val baseAggs = sums.map { case (_, dst) =>
      sum(col(s"b.__t_$dst")).as(s"__b_$dst") }
    val bases = yearTotals.alias("a")
      .join(yearTotals.alias("b"), col("b.__yr") < col("a.__yr"), "left")
      .groupBy(col("a.__yr").as("__yr"))
      .agg(baseAggs.head, baseAggs.tail: _*)
    val out = running.join(broadcast(bases), Seq("__yr"))
    sums.foldLeft(out) { case (df, (_, dst)) =>
      df.withColumn(dst, col(dst) + coalesce(col(s"__b_$dst"), lit(0)))
    }.drop("__yr" +: sums.map { case (_, dst) => s"__b_$dst" }: _*)
  }

  /** Floor `ts` to an aligned bucket of `seconds` (epoch-aligned, UTC). */
  def bucket(ts: Column, seconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds)

  /** Gap-free bucket spine between min and max observed bucket, inclusive. */
  def spine(df: DataFrame, bucketCol: String, seconds: Long): DataFrame =
    df.agg(min(col(bucketCol)).as("lo"), max(col(bucketCol)).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL $seconds SECONDS"))).as(bucketCol))

  /** One frequency: bucketed counts/sums, gap-filled, with cumulative cols. */
  def resample(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      seconds: Long,
      freqLabel: String): DataFrame = {
    val bucketed = events
      .select(bucket(col(tsCol), seconds).as("Date"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      .groupBy("Date")
      .agg(count(lit(1)).as("Count"), sum("__v").as("Total_Value"))

    val full = spine(bucketed, "Date", seconds)
      .join(bucketed, Seq("Date"), "left")
      .select(col("Date"),
        coalesce(col("Count"), lit(0L)).as("Count"),
        coalesce(col("Total_Value"), lit(0).cast("decimal(18,2)")).as("Total_Value"))

    gapFreeCumulative(full, "Date",
      Seq("Count" -> "Cumulative_Count", "Total_Value" -> "Cumulative_Value"))
      .withColumn("Cumulative_Value", col("Cumulative_Value").cast("decimal(18,2)"))
      .withColumn("Frequency", lit(freqLabel))
  }

  /** Stack multiple frequencies, as the reference's timeseries reports do. */
  def multiFrequency(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      freqs: Seq[(String, Long)]): DataFrame =
    freqs.map { case (label, secs) => resample(events, tsCol, valueCol, secs, label) }
      .reduce(_.unionByName(_))

  /** Gap-based sessionization: a new session starts when the delta to the
    * previous event of the same user exceeds `gapSeconds`. Single shuffle on
    * user, in-partition sort — the classic scalable formulation.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol)
    // Gap compare in µs epochs (unix_micros ↔ DuckDB epoch_us); whole-second
    // unix_timestamp would truncate fractional gaps and flip boundary rows.
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("__new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_session")
  }
}
