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

  /** Mapped + coerced capture for column `name` from the variant's groups
    * array: numeric cols comma-stripped and cast (null on failure); strings
    * trimmed, blank→null (a non-participating group is already null).
    */
  private def mapped(groups: Column, v: VariantDef, name: String): Column = {
    val groupIdx = v.columns.zipWithIndex
      .collectFirst { case (n, i) if n == name => i + 1 }
      .getOrElse(sys.error(s"column $name not captured by variant ${v.regex}"))
    val raw = element_at(groups, groupIdx)
    numericCols.get(name) match {
      case Some(t) => regexp_replace(raw, ",", "").cast(t)
      case None => nullif(trim(raw), lit(""))
    }
  }

  /** Required-column validity: the variant matched at all (groups non-null)
    * and every required capture is non-null after coercion (numeric parse
    * failure ⇒ fall through to the next variant, exactly like the
    * reference's validation).
    */
  private def variantValid(groups: Column, v: VariantDef): Column =
    v.required.map(r => mapped(groups, v, r).isNotNull)
      .foldLeft(groups.isNotNull)(_ && _)

  /** One broadcast variant as a nullable struct of the full payload.
    *
    * The regex executes ONCE per row via [[graft.expr.RegexGroups]] (the
    * identical sub-expressions below merge under Catalyst's subexpression
    * elimination) — with rlike + per-column regexp_extract, the 35-variant
    * dispatch ran each regex up to 9× per row and its generated code blew
    * past the whole-stage-codegen size limit.
    */
  private def variantStruct(content: Column, g: GroupDef, v: VariantDef): Column = {
    val groups = graft.expr.RegexGroups.regexGroups(content, v.regex)
    val captured = v.columns.filterNot(_ == "_").toSet
    val fields = broadcastPayload.map {
      case ("Broadcast_Type", _) => lit(g.broadcastType).as("Broadcast_Type")
      case (name, t) if captured.contains(name) => mapped(groups, v, name).as(name)
      case (name, t) => lit(null).cast(t).as(name)
    }
    when(variantValid(groups, v), struct(fields: _*))
  }

  /** The full broadcast dispatch: coalesce over groups × variants in config
    * order — first match that validates wins.
    */
  def broadcastStruct(content: Column, config: ParseConfig): Column =
    coalesce(config.groups.flatMap(g =>
      g.variants.map(v => variantStruct(content, g, v))): _*)

  /** Chat pattern as a nullable struct (tried before broadcasts). */
  def chatStruct(content: Column, config: ParseConfig): Column = {
    val v = VariantDef(config.chatRegex, config.chatColumns, config.chatRequired)
    val groups = graft.expr.RegexGroups.regexGroups(content, config.chatRegex)
    val fields = config.chatColumns.filterNot(_ == "_").map(n =>
      mapped(groups, v, n).as(n))
    when(variantValid(groups, v), struct(fields: _*))
  }

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
