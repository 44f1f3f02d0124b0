package graft.streaming

import graft.parse.{OsrsPatterns, ParseConfig, ParseEngine}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming ingest path (SURVEY.md §2.7 T3): the reference's
  * overlap-and-UNIQUE idempotency contract is exactly at-least-once
  * delivery + keyed dedup inside a watermark, so the streaming variant is
  *
  *   readStream → escape-clean → withWatermark(10 min)
  *     → dropDuplicates(timestamp, raw_content) → the SAME compiled parse
  *     column tree → silver sink (append) / foreachBatch gold rebuild.
  *
  * The parse expression tree is shared verbatim with the batch path
  * ([[ParseEngine.parse]] is called on the streaming frame) — one codebase,
  * two execution modes, which is the point of declaring the dispatch as
  * expressions instead of a row loop.
  */
object StreamingIngest {

  /** Watermarked, deduplicated raw stream from any streaming source frame
    * with (id, timestamp, raw_content).
    */
  def dedupedRaw(rawStream: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    rawStream
      .withWatermark("timestamp", watermarkDelay)
      .dropDuplicates(Seq("timestamp", "raw_content"))

  /** Dedup for retried deliveries that carry DIFFERENT event timestamps
    * (a webhook redelivery is re-stamped at send time, so a (ts, content)
    * key never matches). `dropDuplicatesWithinWatermark` keys on the
    * content alone and holds state only until the watermark passes the
    * FIRST sighting — bounded state, unlike a ts-less `dropDuplicates`,
    * which would pin every key forever.
    */
  def dedupedRawById(
      rawStream: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes",
      tsCol: String = "timestamp"): DataFrame =
    rawStream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming exact-content dedup over a document stream — the streaming
    * face of [[graft.ops.Dedup.exactByDigest]]: normalize, md5, keep the
    * first sighting of each digest within the watermark. At 100 TB this is
    * the continuous-ingest dedup gate in front of a training corpus; state
    * is one digest per distinct document per watermark window.
    */
  def streamingContentDedup(
      docStream: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docStream
      .withColumn("__digest", md5(graft.ops.Dedup.normalizeText(col(textCol))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("__digest"))
      .drop("__digest")

  /** Streaming silver broadcasts: same compiled dispatch as batch. */
  def broadcastStream(
      rawStream: DataFrame,
      config: ParseConfig = OsrsPatterns.default,
      watermarkDelay: String = "10 minutes"): DataFrame =
    ParseEngine.parse(dedupedRaw(rawStream, watermarkDelay), config).broadcasts

  /** Append-mode silver writer to parquet with checkpointing. */
  def silverWriter(
      broadcasts: DataFrame,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    broadcasts.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** Watermarked tumbling-window counts over the parsed broadcast stream —
    * the streaming form of the timeseries reports (SURVEY.md §2.7 T1 as a
    * stream): append-mode emits a bucket only once the watermark passes
    * its end, so the sink receives each (bucket, type) row exactly once.
    */
  def windowedCounts(
      broadcasts: DataFrame,
      windowDuration: String = "6 hours",
      watermarkDelay: String = "10 minutes"): DataFrame =
    broadcasts
      .withWatermark("Timestamp", watermarkDelay)
      .groupBy(window(col("Timestamp"), windowDuration), col("Broadcast_Type"))
      .agg(count(lit(1)).as("Count"), sum(col("Item_Value")).as("Total_Value"))
      .select(col("window.start").as("bucket"), col("Broadcast_Type"),
        col("Count"), col("Total_Value"))

  /** Sliding event-time windows — the streaming twin of
    * `TimeSeries.trailingWindow`: each event contributes to
    * window/slide overlapping windows (Spark expands the row to its
    * windows at map time, so the shuffle still carries partial
    * aggregates keyed by (window, type)); the watermark bounds state,
    * finalizing and evicting a window once event time passes its end
    * plus the delay.
    */
  def slidingCounts(
      broadcasts: DataFrame,
      windowDuration: String = "12 hours",
      slideDuration: String = "6 hours",
      watermarkDelay: String = "10 minutes"): DataFrame =
    broadcasts
      .withWatermark("Timestamp", watermarkDelay)
      .groupBy(window(col("Timestamp"), windowDuration, slideDuration),
        col("Broadcast_Type"))
      .agg(count(lit(1)).as("Count"), sum(col("Item_Value")).as("Total_Value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("Broadcast_Type"), col("Count"), col("Total_Value"))

  /** Gold rebuild per micro-batch (`foreachBatch`): clan-scale gold is a
    * full rebuild each trigger, exactly like the reference's 15-minute
    * cron (SURVEY.md §2.7 T7 — period boundaries move every run, so
    * incremental agg state cannot express the reports; rebuild-on-trigger
    * is the honest contract, and each rebuild is itself distributed).
    *
    * IMPORTANT: `rebuild` receives only the CURRENT deduped micro-batch —
    * accumulating it into full history (and rebuilding the reports from
    * that) is the callback's job. [[StreamingOsrsGold]] is the assembled
    * version (StreamingGold store merge → pipeline rerun over ALL
    * history → blue/green publish); use it unless wiring a custom store.
    */
  def goldRebuildWriter(
      rawStream: DataFrame,
      rebuild: DataFrame => Unit,
      checkpointDir: String,
      watermarkDelay: String = "10 minutes"): DataStreamWriter[Row] =
    dedupedRaw(rawStream, watermarkDelay).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        rebuild(batch.toDF())
      }
}
