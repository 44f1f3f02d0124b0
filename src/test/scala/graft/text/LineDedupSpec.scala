package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class LineDedupSpec extends AnyFunSuite with SparkTestBase {

  private def run(rows: (Long, String)*) = {
    import spark.implicits._
    LineDedup.keepFirst(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("boilerplate line survives only at its first corpus occurrence") {
    val out = run(
      1L -> "unique alpha\nsubscribe now\nunique beta",
      2L -> "subscribe now\nunique gamma",
      3L -> "unique delta\nsubscribe now")
    assert(out(1L) === (("unique alpha\nsubscribe now\nunique beta", 3L, 0L)))
    assert(out(2L) === (("unique gamma", 1L, 1L)))
    assert(out(3L) === (("unique delta", 1L, 1L)))
  }

  test("within-document repeats keep only the earliest position") {
    val out = run(1L -> "chorus line\nverse one\nchorus line\nverse two")
    assert(out(1L) === (("chorus line\nverse one\nverse two", 3L, 1L)))
  }

  test("document made entirely of seen lines reassembles to null") {
    val out = run(
      1L -> "only line here",
      2L -> "only line here")
    assert(out(2L) === ((null, 0L, 1L)))
  }

  test("first occurrence is arbitrated by (doc, position), not hash order") {
    // doc 1 has the shared line LATER than doc 2's position, but doc 1 < doc 2
    // wins regardless of position within the doc.
    val out = run(
      1L -> "aaa\nshared tail",
      2L -> "shared tail\nbbb")
    assert(out(1L)._1 === "aaa\nshared tail")
    assert(out(2L)._1 === "bbb")
  }

  test("empty lines are discarded, order otherwise preserved") {
    val out = run(1L -> "one\n\ntwo\n\n\nthree")
    assert(out(1L) === (("one\ntwo\nthree", 3L, 0L)))
  }
}
