package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw → silver parse stage (reference entry point 2, SURVEY.md §3.2).
  *
  * Input contract: `raw(id LONG, timestamp TIMESTAMP, raw_content STRING)`.
  * Output: the three silver tables of FIXTURES.md A2 —
  * `chat`, `clan_broadcasts` (multi-user rows exploded), `unparsed_logs`
  * (dead-letter with failure reason, retried every run).
  *
  * Execution shape: one pass over raw (the entire dispatch is a single
  * projection — see [[PatternCompiler]]), then three narrow filters. No
  * shuffle at all; the stage is embarrassingly parallel over raw
  * partitions, which is what lets it scale to arbitrary message volume.
  */
object ParseEngine {

  case class Result(chat: DataFrame, broadcasts: DataFrame, unparsed: DataFrame)

  def parse(raw: DataFrame, config: ParseConfig = OsrsPatterns.default): Result = {
    val content = PatternCompiler.cleanEscapes(col("raw_content"))

    // The dispatch structs are single opaque ParseDispatch expressions, so
    // no optimizer barrier is needed: SimplifyExtractValueOps cannot rewrite
    // `__b.Field` through them (round 1's coalesce-of-structs tree needed a
    // non-deterministic rand(0) wrapper to stop a 17× duplication, which
    // excluded the projection from whole-stage codegen). Field extractions
    // share one eval per row via codegen subexpression elimination.
    val annotated = raw
      .withColumn("__content", content)
      .withColumn("__chat", PatternCompiler.chatStruct(col("__content"), config))
      .withColumn("__b", PatternCompiler.broadcastStruct(col("__content"), config))

    val chat = annotated
      .filter(col("__chat").isNotNull)
      .select(
        col("id").as("raw_log_id"),
        col("timestamp").as("Timestamp"),
        lit("Chat").as("MessageType"),
        col("__chat.Rank").as("Rank"),
        col("__chat.Status").as("Status"),
        col("__chat.Username").as("Username"),
        col("__chat.Content").as("Content"))

    // Chat wins over broadcasts (tried first in the reference loop).
    val b = annotated
      .filter(col("__chat").isNull && col("__b").isNotNull)
      .withColumn("__mode", PatternCompiler.gameMode(col("__content"), config.gameModes))
      .withColumn("__type", PatternCompiler.prefixedType(col("__b.Broadcast_Type"), col("__mode")))
      // Total Level default skill — compares the FINAL (prefixed) type,
      // bug-compatible with 2_parse_engine.py:205-206.
      .withColumn("__skill",
        when(col("__type") === "Total Level", lit("Total")).otherwise(col("__b.Skill")))

    // Silver schema order (FIXTURES.md A2); Username explodes multi-user
    // broadcasts into one row per user.
    val payloadCols = PatternCompiler.broadcastPayload.map {
      case ("Username", _) =>
        explode_outer(PatternCompiler.usernameList(col("__b.Username"))).as("Username")
      case ("Broadcast_Type", _) => col("__type").as("Broadcast_Type")
      case ("Skill", _) => col("__skill").as("Skill")
      case (n, _) => col(s"__b.$n").as(n)
    }
    val broadcasts = b
      .select(
        Seq(col("id").as("raw_log_id"),
          col("timestamp").as("Timestamp"),
          col("__content").as("Content")) ++ payloadCols: _*)

    // Dead-letter. Failure reason mirrors the reference's loop: the LAST
    // matching-but-invalid broadcast variant wins, else the chat-validation
    // reason, else the no-match default (2_parse_engine.py:141-167,249-260).
    // One FirstMatchLabel expression (variants reversed) instead of a
    // coalesce over 36 rlike branches.
    val reasonRules = config.groups.flatMap(g => g.variants.map(v =>
      (v.regex, s"Required column blank for Broadcast Type '${g.broadcastType}'."))).reverse :+
      (config.chatRegex, "Chat message failed validation on required columns.")
    // FirstMatchLabel is null-safe, so a null raw_content would yield a null
    // reason; dead-letter rows must always carry a non-null failure_reason.
    val reason = coalesce(
      graft.expr.FirstMatchLabel.label(
        col("__content"), reasonRules, "No matching pattern found"),
      lit("No matching pattern found"))

    val unparsed = annotated
      .filter(col("__chat").isNull && col("__b").isNull)
      .select(
        col("id").as("raw_log_id"),
        col("timestamp").as("timestamp"),
        col("__content").as("raw_content"),
        reason.as("failure_reason"))

    Result(chat, broadcasts, unparsed)
  }
}
