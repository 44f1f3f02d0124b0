package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeUrlSpec extends AnyFunSuite with SparkTestBase {

  private def one(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      in: String): String = {
    import spark.implicits._
    Seq(in).toDF("s").select(f(col("s"))).head.getString(0)
  }

  // ---- NfcNormalize ----

  test("decomposed accents compose to single codepoints") {
    val composed = one(graft.expr.NfcNormalize.nfc, "café")
    assert(composed === "café")
    assert(composed.length === 4)
  }

  test("already-normalized text is returned unchanged (fast path)") {
    assert(one(graft.expr.NfcNormalize.nfc, "café plain") === "café plain")
    assert(one(graft.expr.NfcNormalize.nfc, "") === "")
  }

  test("all planted base x mark combinations compose") {
    for (b <- Seq("a", "e", "o"); m <- Seq("́", "̀", "̈", "̃")) {
      val out = one(graft.expr.NfcNormalize.nfc, b + m)
      assert(out.length === 1, s"$b+U+${m.codePointAt(0).toHexString} stayed decomposed")
    }
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .select(graft.expr.NfcNormalize.nfc(col("s"))).head
    assert(r.isNullAt(0))
  }

  // ---- Urls.canonicalize ----

  test("scheme/host lower-case, path case preserved") {
    assert(one(Urls.canonicalize, "HTTPS://WWW.Example.COM/Path/File") ===
      "https://www.example.com/Path/File")
  }

  test("default ports stripped, explicit ports kept") {
    assert(one(Urls.canonicalize, "https://a.com:443/x") === "https://a.com/x")
    assert(one(Urls.canonicalize, "http://a.com:80/x") === "http://a.com/x")
    assert(one(Urls.canonicalize, "https://a.com:443") === "https://a.com")
    assert(one(Urls.canonicalize, "https://a.com:8443/x") === "https://a.com:8443/x")
    assert(one(Urls.canonicalize, "http://a.com:443/x") === "http://a.com:443/x")
  }

  test("fragment and tracking params dropped, real params kept") {
    assert(one(Urls.canonicalize,
      "https://a.com/p?utm_source=x&id=7&utm_campaign=y#sec") ===
      "https://a.com/p?id=7")
    assert(one(Urls.canonicalize, "https://a.com/p?gclid=abc") ===
      "https://a.com/p")
    assert(one(Urls.canonicalize, "https://a.com/p?fbclid=1&q=k") ===
      "https://a.com/p?q=k")
    assert(one(Urls.canonicalize, "https://a.com/p?id=1&name=Z") ===
      "https://a.com/p?id=1&name=Z")
  }

  test("tracking removal is anchored: non-tracking lookalikes and paths survive") {
    // A param whose NAME merely contains 'utm_' is not a tracking param.
    assert(one(Urls.canonicalize, "https://a.com/p?my_utm_source=1") ===
      "https://a.com/p?my_utm_source=1")
    assert(one(Urls.canonicalize, "https://a.com/p?xfbclid=9") ===
      "https://a.com/p?xfbclid=9")
    // A path segment containing 'gclid=' is not a query param.
    assert(one(Urls.canonicalize, "https://a.com/gclid=x/page") ===
      "https://a.com/gclid=x/page")
    // Consecutive tracking params leave no double separators behind.
    assert(one(Urls.canonicalize, "https://a.com/p?a=1&utm_c=2&b=2") ===
      "https://a.com/p?a=1&b=2")
    assert(one(Urls.canonicalize, "https://a.com/p?utm_a=1&utm_b=2&id=3") ===
      "https://a.com/p?id=3")
  }

  test("canonical forms collapse distinct raw spellings") {
    val raws = Seq(
      "HTTPS://Example.COM:443/p?utm_source=a#f1",
      "https://example.com/p?utm_medium=b#f2",
      "https://EXAMPLE.com:443/p")
    val canon = raws.map(one(Urls.canonicalize, _)).distinct
    assert(canon === Seq("https://example.com/p"))
  }
}
