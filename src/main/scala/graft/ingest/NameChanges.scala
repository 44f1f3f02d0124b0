package graft.ingest

import graft.reports.MappingRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Name-change sync pipeline (SURVEY.md §2.1 S13; reference
  * `src/6_fetch_name_changes.py:39-137`): scan a channel's embed messages,
  * parse "Member Name Changed" embeds into `(old_name, new_name)` rows,
  * append them idempotently under a message-id primary key, and advance a
  * `sync_metadata` message-id watermark — then feed the accumulated table
  * into [[graft.enrich.Enrichment.applyUsernameMapping]] as a rules source.
  *
  * The reference enforces idempotency with a SQLite PRIMARY KEY +
  * per-message INSERT (IntegrityError swallowed, `:104-116`); here the same
  * contract is a keyed dedup + left-anti join against the stored table —
  * one shuffle on the id, no driver state. The Discord `after=` cursor
  * (`:92`, exclusive) becomes a plain watermark filter.
  */
object NameChanges {

  /** `re.search(r"(.+?)\s*→\s*(.+)")` from `6_fetch_name_changes.py:97` —
    * leftmost match, lazy left side, both names trimmed after capture.
    * Spark's `regexp_extract` has identical search-anywhere semantics.
    */
  val ArrowPattern = "(.+?)\\s*→\\s*(.+)"

  /** The embed title that marks a name-change message (`:95`). */
  val EmbedTitle = "Member Name Changed"

  /** Parse an embed-message scan into name-change rows.
    *
    * Input columns: an id, a created-at timestamp, an embed title and an
    * embed description (null description = no embed, skipped, as `:93-96`).
    * Output: `discord_message_id, old_name, new_name, change_timestamp` —
    * the reference's table schema (`:22-29`). Non-matching descriptions are
    * dropped exactly like the `if match:` guard (`:97-99`).
    */
  def parse(
      messages: DataFrame,
      idCol: String = "message_id",
      titleCol: String = "embed_title",
      descCol: String = "embed_description",
      tsCol: String = "created_at"): DataFrame =
    messages
      .filter(col(titleCol) === EmbedTitle && col(descCol).isNotNull)
      .withColumn("__old", regexp_extract(col(descCol), ArrowPattern, 1))
      .withColumn("__new", regexp_extract(col(descCol), ArrowPattern, 2))
      .filter(col("__old") =!= "") // no match → regexp_extract yields ""
      .select(
        col(idCol).as("discord_message_id"),
        trim(col("__old")).as("old_name"),
        trim(col("__new")).as("new_name"),
        col(tsCol).as("change_timestamp"))

  /** Discord's `after=` cursor is EXCLUSIVE (`:92`): only messages strictly
    * above the stored watermark are scanned. `None` = full history scan.
    */
  def afterWatermark(messages: DataFrame, lastId: Option[Long], idCol: String = "message_id"): DataFrame =
    lastId.map(w => messages.filter(col(idCol) > w)).getOrElse(messages)

  /** Idempotent append under the `discord_message_id` PRIMARY KEY
    * (`:104-116`): rows of `incoming` not already stored.
    */
  def rowsToAppend(existing: DataFrame, incoming: DataFrame): DataFrame =
    IncrementalIngest.rowsToAppend(existing, incoming, Seq("discord_message_id"))

  /** Next `last_message_id` watermark (`:119-125`): the max id seen this
    * run across ALL scanned messages (matched or not), never regressing
    * below the stored value.
    */
  def nextWatermark(scanned: DataFrame, lastId: Option[Long], idCol: String = "message_id"): Option[Long] = {
    val m = scanned.agg(max(col(idCol))).head
    val seen = if (m.isNullAt(0)) None else Some(m.getLong(0))
    (seen.toSeq ++ lastId.toSeq).reduceOption(_ max _)
  }

  /** Upsert into the `sync_metadata` kv table (`:31-37`, `:50-57`:
    * `INSERT ... ON CONFLICT(key) DO UPDATE`).
    */
  def upsertMetadata(meta: DataFrame, key: String, value: String): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.filter(col("key") =!= lit(key))
      .unionByName(Seq((key, value)).toDF("key", "value"))
  }

  /** Bridge the accumulated `name_changes` table into
    * [[graft.enrich.Enrichment.applyUsernameMapping]] as mapping rules.
    *
    * Ordered NEWEST-FIRST: `applyUsernameMapping` folds rules in reverse
    * config order with each rule matching the CURRENT value, so
    * newest-first config order applies renames oldest-first and chains
    * compose — A→B (t1) then B→C (t2) rewrites a stored "A" to "C".
    * Undated: a rename rewrites the user's full history, which is what
    * re-running the reference transform with an updated mapping does.
    *
    * Driver-side collect is intentional — name changes are config-sized
    * (a clan's rename log), and the output feeds a driver-built expression.
    */
  def toMappingRules(nameChanges: DataFrame): Seq[MappingRule] =
    nameChanges
      .select(col("old_name"), col("new_name"),
        col("change_timestamp"), col("discord_message_id"))
      .orderBy(col("change_timestamp").desc, col("discord_message_id").desc)
      .collect()
      .toSeq
      .map(r => MappingRule(
        targetUsername = r.getString(1),
        sourceUsernames = Seq(r.getString(0)),
        startDate = None,
        endDate = None))
}
