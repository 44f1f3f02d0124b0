package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the Common-Crawl-shaped front door of a web
  * training corpus: strip script/style payloads, comments and tags,
  * decode the frequent entities, collapse whitespace. Deliberately a
  * REGEX-CHAIN extractor, not a DOM parser: every pattern is in the
  * java.regex ∩ RE2 shared syntax (the [[Redact]]/[[Urls]] discipline),
  * so any engine reproduces the exact output bytes — which is what makes
  * the downstream hashes (dedup keys, fingerprints) portable. A
  * readability-grade boilerplate classifier would sit AFTER this, on the
  * extracted text.
  *
  * Map-only, codegen'd (`regexp_replace` chains); nothing here shuffles.
  */
object Html {

  private def re(c: Column, pat: String, rep: String): Column =
    regexp_replace(c, pat, rep)

  /** Extracted text: script/style/comments dropped WITH content, tags
    * dropped (as separators), common entities decoded (`&amp;` LAST so
    * `&amp;lt;` decodes to the literal `&lt;`, not `<`), whitespace
    * collapsed and trimmed.
    */
  def stripTags(html: Column): Column = {
    var c = html
    // Payload-bearing containers go first, content and all.
    c = re(c, "(?is)<script[^>]*>.*?</script\\s*>", " ")
    c = re(c, "(?is)<style[^>]*>.*?</style\\s*>", " ")
    c = re(c, "(?s)<!--.*?-->", " ")
    // Remaining tags become separators so `</td><td>` doesn't glue words.
    c = re(c, "(?s)</?[a-zA-Z][^>]*>", " ")
    // Frequent entities; ampersand last (see scaladoc).
    c = regexp_replace(c, "&nbsp;", " ")
    c = regexp_replace(c, "&lt;", "<")
    c = regexp_replace(c, "&gt;", ">")
    c = regexp_replace(c, "&quot;", "\"")
    c = regexp_replace(c, "&#39;", "'")
    c = regexp_replace(c, "&amp;", "&")
    trim(re(c, "\\s+", " "))
  }

  /** `<a href="…">anchor</a>` capture — double-quoted href attribute,
    * non-greedy anchor body, dot-all for multi-line anchors.
    */
  val linkPattern: String =
    "(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a\\s*>"

  /** Outbound link hrefs, in order of appearance. */
  def linkHrefs(html: Column): Column =
    regexp_extract_all(html, lit(linkPattern), lit(1))

  /** Anchor texts aligned index-for-index with [[linkHrefs]] (both come
    * from the same pattern walk, so the arrays zip). Feeding hrefs
    * through [[Urls.canonicalize]] and anchors through [[stripTags]]
    * turns a raw HTML corpus into the (source page → canonical target,
    * anchor text) edge list a link graph / PageRank run starts from.
    */
  def linkAnchors(html: Column): Column =
    regexp_extract_all(html, lit(linkPattern), lit(2))
}
