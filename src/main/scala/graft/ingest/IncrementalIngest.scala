package graft.ingest

import java.sql.Timestamp
import java.time.ZonedDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental/idempotent ingestion contract (SURVEY.md §2.1 S2–S4, §2.3
  * J6/J7): watermark-based fetch-range resolution, constraint-style
  * idempotent append, and the dead-letter retry/cleanup joins.
  *
  * The reference enforces idempotency with SQLite `UNIQUE` + per-row
  * `INSERT OR IGNORE`; Spark sinks enforce nothing, so the same contract is
  * an explicit dedup + left-anti join against the existing table — shuffle
  * on the key columns, no driver-side state.
  */
object IncrementalIngest {

  /** Fetch-range resolution (`1_fetch_data.py:22-55`): start = stored
    * max(timestamp) minus the overlap (cold start: `maxLookbackDays` back);
    * end = now minus the end offset. The overlap deliberately re-reads the
    * tail; the idempotent append swallows the duplicates (at-least-once +
    * keyed dedup).
    */
  def resolveFetchRange(
      existing: Option[DataFrame],
      now: ZonedDateTime,
      overlapMinutes: Long = 10,
      endOffsetMinutes: Long = 1,
      maxLookbackDays: Long = 90): (Timestamp, Timestamp) = {
    val end = Timestamp.from(now.minusMinutes(endOffsetMinutes).toInstant)
    val coldStart = Timestamp.from(now.minusDays(maxLookbackDays).toInstant)
    val start = existing
      .flatMap(df => Option(df.agg(max(col("timestamp"))).head.getTimestamp(0)))
      .map(maxTs => new Timestamp(maxTs.getTime - overlapMinutes * 60000L))
      .getOrElse(coldStart)
    (start, end)
  }

  /** Idempotent append (`1_fetch_data.py:147-174`): the rows of `incoming`
    * to actually write — deduped on `keys` (deterministic keep-first by
    * `keys` order themselves) and anti-joined against `existing`.
    */
  def rowsToAppend(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    incoming
      .dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Parse-scope resolution for mode "new" (`2_parse_engine.py:350-371`):
    * raw rows above the parsed-id watermark, plus the dead-letter retries,
    * deduped by id.
    */
  def rowsToParse(
      raw: DataFrame,
      parsedMaxId: Option[Long],
      deadLetter: DataFrame): DataFrame = {
    val newRows = parsedMaxId match {
      case Some(w) => raw.filter(col("id") > w)
      case None => raw
    }
    val retries = raw.join(
      deadLetter.select(col("raw_log_id").as("id")), Seq("id"), "left_semi")
    newRows.unionByName(retries).dropDuplicates("id")
  }

  /** Watermark for mode "new": max raw id across both silver tables
    * (`2_parse_engine.py:352-353`).
    */
  def parsedWatermark(chat: DataFrame, broadcasts: DataFrame): Option[Long] = {
    val m = chat.select(col("raw_log_id"))
      .unionByName(broadcasts.select(col("raw_log_id")))
      .agg(max(col("raw_log_id"))).head
    if (m.isNullAt(0)) None else Some(m.getLong(0))
  }

  /** Dead-letter cleanup (`2_parse_engine.py:382-394`): drop entries whose
    * raw id parsed successfully this run.
    */
  def cleanDeadLetter(deadLetter: DataFrame, parsedIds: DataFrame): DataFrame =
    deadLetter.join(
      parsedIds.select(col("raw_log_id")).distinct(), Seq("raw_log_id"), "left_anti")
}
