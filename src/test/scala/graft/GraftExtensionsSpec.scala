package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("registered SQL functions: parse_duration and vec_dot") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT parse_duration('1:15:45') AS s, parse_duration('bad') AS inf, " +
        "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head
    assert(r.getDouble(0) == 4545.0)
    assert(r.getDouble(1).isPosInfinity)
    assert(r.getDouble(2) == 11.0)
  }

  test("registered SQL function: word_shingles with and without distinct") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT word_shingles('a b a b', 2) AS all, " +
        "word_shingles('a b a b', 2, true) AS dst").head
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(r.getSeq[String](1) == Seq("a b", "b a"))
    intercept[Exception](spark.sql("SELECT word_shingles('x', 'no')").head)
  }

  test("registered SQL function: nfc_normalize composes decomposed accents") {
    GraftExtensions.register(spark)
    // Input is decomposed caf + e + U+0301; NFC output is composed U+00E9.
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS c, " +
        "length(nfc_normalize('cafe\u0301')) AS n").head
    assert(r.getString(0) === "caf\u00e9")
    assert(r.getInt(1) === 4)
  }

  test("registered SQL functions: compress_stats and cdc_chunks") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT compress_stats(repeat('na ', 200)).utf8_bytes AS ob, " +
        "compress_stats(repeat('na ', 200)).deflate_bytes AS db").head
    assert(r.getLong(0) == 600L)
    assert(r.getLong(1) < 60L) // 200x-repeated trigram collapses
    val c = spark.sql(
      "SELECT size(cdc_chunks(CAST(repeat('xyzzy', 500) AS BINARY), " +
        "16, 5, 128)) AS n").head
    assert(c.getInt(0) >= 2500 / 128) // tiling respects the max bound
    intercept[Exception](
      spark.sql("SELECT cdc_chunks(CAST('x' AS BINARY), 'bad', 5, 9)").head)
  }

  test("vec_dot NULLS on length mismatch and null elements instead of " +
      "reading a plausible prefix/zero dot") {
    graft.GraftExtensions.register(spark)
    val mism = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D)) AS d").head
    assert(mism.isNullAt(0), "mismatched dims silently dotted the prefix")
    val nullElem = spark.sql(
      "SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), " +
        "array(3.0D, 4.0D)) AS d").head
    assert(nullElem.isNullAt(0), "null element silently read as 0.0")
  }

  test("unary SQL builders reject wrong arity with a pointed message") {
    graft.GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT parse_duration('1:02', 'extra')").head
    }
    assert(e.getMessage.contains("exactly 1"), e.getMessage)
  }

  test("wrong-typed inputs to string expressions fail at ANALYSIS, not " +
      "mid-scan in generated code") {
    graft.GraftExtensions.register(spark)
    Seq("jaro_winkler(1, 2)", "nfc_normalize(1)", "word_shingles(1, 3)")
      .foreach { call =>
        val e = intercept[Exception] { spark.sql(s"SELECT $call").head }
        assert(e.getMessage.toLowerCase.contains("string") ||
          e.getMessage.contains("DATATYPE_MISMATCH"), s"$call: ${e.getMessage}")
      }
  }
}
