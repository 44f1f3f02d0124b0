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

    // Optimizer barrier: without it, SimplifyExtractValueOps rewrites every
    // downstream `__b.Field` access into its own copy of the whole
    // 35-variant CASE tree — the dispatch would run once PER EXTRACTED
    // FIELD per row (17× work, measured as such at bench scale). A
    // non-deterministic wrapper pins the struct into its own projection so
    // consumers read the computed attribute instead. rand(0) is seeded and
    // the predicate is always true; semantics are unchanged.
    def barrier(c: Column): Column = when(rand(0) >= -1.0, c)

    val annotated = raw
      .withColumn("__content", content)
      .withColumn("__chat", barrier(PatternCompiler.chatStruct(col("__content"), config)))
      .withColumn("__b", barrier(PatternCompiler.broadcastStruct(col("__content"), config)))

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
    val chatDef = VariantDef(config.chatRegex, config.chatColumns, config.chatRequired)
    val variantReasons = config.groups.flatMap(g => g.variants.map(v =>
      (v, g.broadcastType))).reverse.map { case (v, t) =>
      when(col("__content").rlike(v.regex),
        lit(s"Required column blank for Broadcast Type '$t'."))
    }
    val chatReason = when(col("__content").rlike(config.chatRegex),
      lit("Chat message failed validation on required columns."))
    val reason = coalesce(
      variantReasons :+ chatReason :+ lit("No matching pattern found"): _*)

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
