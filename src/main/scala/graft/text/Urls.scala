package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / domain extraction — the web-corpus provenance primitive
  * (domain-level filtering, dedup and mixture control all key off the
  * registered domain, CommonCrawl-style).
  *
  * Pure expression layer, map-only, codegen'd. Patterns are restricted
  * to the syntax java.util.regex and RE2-family engines share (same
  * discipline as [[Redact]]), so candidate extraction is reproducible
  * across engines.
  */
object Urls {

  /** Host capture: scheme `http(s)://` then the authority's host labels.
    * Shared-syntax regex — no lookarounds, no possessive quantifiers.
    */
  val hostPattern: String = "https?://([a-zA-Z0-9-]+(?:\\.[a-zA-Z0-9-]+)+)"

  /** All URL hosts in `c`, in order of appearance (possibly repeated). */
  def hosts(c: Column): Column = regexp_extract_all(c, lit(hostPattern), lit(1))

  /** Number of URLs in `c`. */
  def urlCount(c: Column): Column = size(hosts(c)).cast("long")

  /** Registered domain of a host (last two labels, lower-cased):
    * `sub3.example7.com` → `example7.com`.
    */
  def registeredDomain(host: Column): Column =
    regexp_extract(lower(host), "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)
}
