package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles a [[ParseConfig]] into Catalyst column trees.
  *
  * The reference executes the dispatch as a Python row loop over 18 groups ×
  * 35 regex variants with first-match-wins ordering
  * (`/root/reference/src/2_parse_engine.py:134-260`). Here the whole
  * dispatch becomes ONE expression: per variant a
  * `when(rlike && required-valid, struct(extracts))`, coalesced in config
  * order — which preserves first-match-wins declaratively and lets
  * whole-stage codegen fuse the entire 35-regex dispatch into a single
  * generated function over the content column. No UDFs, no per-row
  * interpretation; the scan → parse → route pipeline is one map-only stage
  * at any scale.
  *
  * Type upgrades vs the reference (SURVEY.md §1.3): blank-after-trim
  * captures become NULL (SQLite stores ''), numerics are comma-stripped and
  * cast (null on failure — same as the reference's int() fallback).
  */
object PatternCompiler {

  /** Silver broadcast payload columns, in schema order (FIXTURES.md A2). */
  val broadcastPayload: Seq[(String, DataType)] = Seq(
    "Username" -> StringType,
    "Broadcast_Type" -> StringType,
    "Item_Name" -> StringType,
    "Item_Value" -> LongType,
    "Collection_Log_Progress" -> StringType,
    "Skill" -> StringType,
    "Task_Name" -> StringType,
    "New_Level" -> IntegerType,
    "Tier" -> StringType,
    "PB_Time" -> StringType,
    "Source_Mob" -> StringType,
    "Opponent" -> StringType,
    "Pet_Name" -> StringType,
    "Pet_KC" -> IntegerType,
    "Pet_KC_Type" -> StringType,
    "Action_By" -> StringType,
    "New_Group_Lives" -> StringType)

  val numericCols: Map[String, DataType] = Map(
    "Item_Value" -> LongType, "Pet_KC" -> IntegerType, "New_Level" -> IntegerType)

  /** The full broadcast dispatch: ONE compact [[graft.expr.ParseDispatch]]
    * expression over groups × variants in config order — first match that
    * validates wins. Coercion (comma-strip + cast for numerics, trim +
    * blank→null for strings) and required-column validation happen inside
    * the single codegen'd eval, so the 35 regexes run at most once per row
    * with first-match short-circuit.
    */
  def broadcastStruct(content: Column, config: ParseConfig): Column =
    graft.expr.ParseDispatch.dispatch(content,
      config.groups.flatMap(g => g.variants.map(v =>
        graft.expr.DispatchVariant(v.regex, v.columns, v.required, Some(g.broadcastType)))),
      broadcastPayload)

  /** Chat pattern as a nullable struct (tried before broadcasts) — same
    * single-eval dispatch with a one-variant table.
    */
  def chatStruct(content: Column, config: ParseConfig): Column =
    graft.expr.ParseDispatch.dispatch(content,
      Seq(graft.expr.DispatchVariant(
        config.chatRegex, config.chatColumns, config.chatRequired, None)),
      config.chatColumns.filterNot(_ == "_")
        .map(n => n -> numericCols.getOrElse(n, StringType: DataType)))

  /** Game-mode name for a message, or null — first configured rule whose
    * prefix (OR of concatenated AND icon lists) starts the message.
    */
  def gameMode(content: Column, rules: Seq[GameModeRule]): Column =
    if (rules.isEmpty) lit(null).cast(StringType)
    else coalesce(rules.map(r =>
      when(r.prefixes.map(p => content.startsWith(p)).reduce(_ || _), lit(r.name))): _*)

  /** Final broadcast type with the game-mode prefix applied. */
  def prefixedType(broadcastType: Column, mode: Column): Column =
    when(mode.isNotNull, concat(lit("("), mode, lit(") "), broadcastType))
      .otherwise(broadcastType)

  /** Multi-user username split (`2_parse_engine.py:208-245`), including the
    * malformed-"Aand B" repair: any word (length > 3) ending in "and" is
    * split into the stem + the word "and". If the repaired string contains
    * a comma or " and ", commas normalize to " and " and the string splits
    * into one username per row; otherwise the ORIGINAL capture is kept
    * verbatim (repair is only used for multi-user detection — reference
    * behavior, bug-compatible).
    */
  def usernameList(u: Column): Column = {
    val repaired = array_join(
      transform(split(u, " "), w =>
        when(lower(w).endsWith("and") && length(w) > 3,
          concat(w.substr(lit(1), length(w) - 3), lit(" and")))
          .otherwise(w)),
      " ")
    val isMulti = repaired.contains(",") || repaired.contains(" and ")
    val parts = filter(
      transform(split(regexp_replace(repaired, ",", " and "), " and "), x => trim(x)),
      x => x =!= "")
    when(u.isNull, array().cast(ArrayType(StringType)))
      .otherwise(when(isMulti, parts).otherwise(array(u)))
  }

  /** Discord escape cleanup (`1_fetch_data.py:18-20`): backslash before a
    * non-word, non-space char is dropped.
    */
  def cleanEscapes(c: Column): Column =
    regexp_replace(c, """\\([^\w\s])""", "$1")
}
