package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite with SparkTestBase {

  private def strip(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.stripTags(col("h"))).head.getString(0)
  }

  test("script and style payloads vanish with their content") {
    assert(strip("<p>a</p><script>var x = '<b>not text</b>';</script><p>b</p>")
      === "a b")
    assert(strip("before<style media=\"all\">p { color: red }</style>after")
      === "before after")
    // Case-insensitive, multi-line payload.
    assert(strip("x<SCRIPT>\nline1();\nline2();\n</SCRIPT>y") === "x y")
  }

  test("comments vanish, tags become separators, attributes don't leak") {
    assert(strip("<!-- secret -->visible") === "visible")
    assert(strip("<td>a</td><td>b</td>") === "a b")
    assert(strip("""<a href="http://x.com/q?a=1" class="btn">link</a>""")
      === "link")
  }

  test("entities decode, &amp; last so &amp;lt; stays literal") {
    assert(strip("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; c&nbsp;d")
      === "a & b <tag> \"q\" 's' c d")
    assert(strip("&amp;lt;") === "&lt;")
  }

  test("whitespace collapses and trims") {
    assert(strip("  <p>\n  a\n\n   b  </p>\t ") === "a b")
  }

  test("tagless text passes through collapsed") {
    assert(strip("plain  text") === "plain text")
    // A bare '<' that opens no tag is not a tag.
    assert(strip("3 < 5 and 7 > 2") === "3 < 5 and 7 > 2")
  }

  private def links(html: String): Seq[(String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = Seq(html).toDF("h")
      .select(Html.linkHrefs(col("h")), Html.linkAnchors(col("h"))).head
    r.getSeq[String](0).zip(r.getSeq[String](1))
  }

  test("link extraction: hrefs and anchors zip index-for-index") {
    assert(links(
      """<a href="http://a.com/1">one</a>x<a class="c" href="http://b.com/2" rel="nofollow">two</a>""")
      === Seq("http://a.com/1" -> "one", "http://b.com/2" -> "two"))
  }

  test("link extraction: multi-line anchors, no-href and non-anchor tags skipped") {
    assert(links("<a href=\"http://a.com\">line1\nline2</a>") ===
      Seq("http://a.com" -> "line1\nline2"))
    assert(links("""<a name="x">no href</a><b>bold</b>""") === Seq.empty)
  }
}
