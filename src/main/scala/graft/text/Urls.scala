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

  /** Full-URL capture (scheme to first whitespace/angle/quote). */
  val urlPattern: String = "[hH][tT][tT][pP][sS]?://[^\\s<>\"]+"

  /** All URLs in `c`, in order of appearance. */
  def urls(c: Column): Column = regexp_extract_all(c, lit(urlPattern), lit(0))

  /** Canonical form of a URL — the key under which a web corpus dedups,
    * counts and rate-limits its provenance:
    *
    *   1. fragment dropped (`#…` never reaches the server);
    *   2. scheme + authority lower-cased (case-insensitive per RFC 3986),
    *      path/query case preserved;
    *   3. default ports stripped (`:80` for http, `:443` for https);
    *   4. tracking parameters removed (`utm_*`, `fbclid`, `gclid`) with
    *      separator tidy-up (no dangling `?`/`&`, no `?&`).
    *
    * Regex-chain in the shared java.regex ∩ RE2 syntax (no lookarounds:
    * the port strip captures the following delimiter-or-end instead), so
    * the canonical key is reproducible in any engine. Map-only, codegen'd.
    */
  def canonicalize(url: Column): Column = {
    // 1. Fragment.
    var c = regexp_replace(url, "(?s)#.*$", "")
    // 2. Lower-case scheme+authority only: rebuild as lower(head) + tail.
    val head = "^([hH][tT][tT][pP][sS]?://[^/?#]+)"
    c = concat(lower(regexp_extract(c, head, 1)),
      regexp_replace(c, head, ""))
    // 3. Default ports (authority is lower-case now).
    c = regexp_replace(c, "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    c = regexp_replace(c, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    // 4. Tracking params + separator tidy-up. The param name is ANCHORED
    //    to its preceding ?/& (kept via $1): an unanchored form would
    //    also strip the tail of non-tracking params like
    //    `my_utm_source=1` or eat a path segment containing `gclid=`.
    c = regexp_replace(c, "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    c = regexp_replace(c, "&&+", "&")
    c = regexp_replace(c, "\\?&", "?")
    regexp_replace(c, "[?&]$", "")
  }
}
