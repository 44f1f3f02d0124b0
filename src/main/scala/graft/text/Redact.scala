package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for the training-data pipeline: detect and redact
  * emails, IPv4 addresses, and NANP-style phone numbers from a text
  * column before it reaches a training corpus.
  *
  * Pure `regexp_count` / `regexp_replace` expression trees — a map-only
  * codegen'd pass per document, no shuffle. The patterns deliberately use
  * only syntax shared by java.util.regex and RE2 (character classes,
  * bounded repetition, `\b`, non-capturing groups — no backreferences or
  * lookaround), so an engine on either regex family (Spark/Java, DuckDB/
  * RE2, Trino/RE2J) produces identical matches and the operator is
  * oracle-checkable across engines.
  *
  * Redaction order matters and is fixed: emails first (their local parts
  * and domains contain digit runs and dots), then IPv4, then phones.
  * Counts are measured per pattern on the ORIGINAL text, independent of
  * redaction order.
  */
object Redact {

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  def emailCount(c: Column): Column =
    regexp_count(c, lit(emailPattern)).cast("long")

  def ipCount(c: Column): Column =
    regexp_count(c, lit(ipv4Pattern)).cast("long")

  def phoneCount(c: Column): Column =
    regexp_count(c, lit(phonePattern)).cast("long")

  /** Replace every match with its typed placeholder: `<EMAIL>`, `<IP>`,
    * `<PHONE>` — typed (rather than deleted) so downstream token statistics
    * still see a token and a scrubbed corpus remains diffable.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")
}
