package graft.parse

/** Config model for the regex parse engine — the same shapes the reference
  * declares in TOML (`/root/reference/src/config.example.toml:377-538`), so
  * a reference user's pattern config ports 1:1.
  *
  * Semantics (from `/root/reference/src/2_parse_engine.py:118-267`):
  *  - chat pattern tried first; then groups in declaration order, variants
  *    in declaration order; FIRST match that passes required-column
  *    validation wins;
  *  - a capture mapped to `_` is discarded;
  *  - `Item_Value`, `Pet_KC`, `New_Level` are numeric: comma-stripped and
  *    int-cast, null on failure;
  *  - a match only counts if every required column is non-null/non-blank
  *    after mapping — else fall through to the next variant.
  */
case class VariantDef(
    regex: String,
    columns: Seq[String],
    required: Seq[String])

case class GroupDef(
    name: String,
    broadcastType: String,
    variants: Seq[VariantDef])

/** Game-mode rule compiled to prefix alternatives: OR of (concatenated AND
  * icon) prefixes — `/root/reference/src/2_parse_engine.py:83-116`.
  */
case class GameModeRule(name: String, prefixes: Seq[String])

/** Item value override: constant fallback and/or a price-series item id for
  * the as-of dynamic price — `/root/reference/src/2_parse_engine.py:177-197`,
  * config `/root/reference/src/config.example.toml:149-186`.
  */
case class ValueOverride(itemName: String, fallback: Option[Long], itemId: Option[String])

case class ParseConfig(
    chatRegex: String,
    chatColumns: Seq[String],
    chatRequired: Seq[String],
    groups: Seq[GroupDef],
    gameModes: Seq[GameModeRule],
    valueOverrides: Seq[ValueOverride])
