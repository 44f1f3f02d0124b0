package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class DupSpansSpec extends AnyFunSuite with SparkTestBase {

  private def run(l: Int, docs: (Long, String)*): Map[Long, Row] = {
    import spark.implicits._
    DupSpans.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", L = l)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  // Distinct filler so only the planted windows repeat.
  private def uniq(tag: String, n: Int): String =
    (0 until n).map(i => s"${tag}w$i").mkString(" ")

  test("a window repeated across two docs is excised from both") {
    val boiler = "all rights reserved by the example site operator" // 8 toks
    val r = run(8,
      1L -> s"${uniq("a", 5)} $boiler ${uniq("b", 5)}",
      2L -> s"${uniq("c", 4)} $boiler ${uniq("d", 6)}")
    assert(r(1L).getAs[Long]("n_spans") === 1)
    assert(r(1L).getAs[Long]("n_removed") === 8)
    assert(r(1L).getAs[String]("clean") === uniq("a", 5) + " " + uniq("b", 5))
    assert(r(2L).getAs[String]("clean") === uniq("c", 4) + " " + uniq("d", 6))
  }

  test("overlapping duplicated windows merge into ONE maximal span") {
    // 10 shared tokens, L=8 → windows at start 0,1,2 all duplicated;
    // they merge to one span covering tokens 0..9, not three spans.
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val r = run(8,
      1L -> s"$shared ${uniq("x", 6)}",
      2L -> s"$shared ${uniq("y", 6)}")
    assert(r(1L).getAs[Long]("n_spans") === 1)
    assert(r(1L).getAs[Long]("n_removed") === 10)
    assert(r(1L).getAs[String]("clean") === uniq("x", 6))
  }

  test("a window repeated WITHIN one doc is duplicated too") {
    val rep = (0 until 8).map(i => s"r$i").mkString(" ")
    val r = run(8, 1L -> s"$rep ${uniq("m", 4)} $rep")
    assert(r(1L).getAs[Long]("n_spans") === 2)
    assert(r(1L).getAs[Long]("n_removed") === 16)
    assert(r(1L).getAs[String]("clean") === uniq("m", 4))
  }

  test("docs shorter than L and unique docs pass through unchanged") {
    val r = run(8,
      1L -> "too short to window",
      2L -> uniq("u", 12))
    for (id <- Seq(1L, 2L)) {
      assert(r(id).getAs[Long]("n_spans") === 0)
      assert(r(id).getAs[Long]("n_removed") === 0)
      assert(r(id).getAs[Double]("dup_frac") === 0.0)
    }
    assert(r(1L).getAs[String]("clean") === "too short to window")
    assert(r(2L).getAs[Long]("n_tokens") === 12)
  }

  test("an entirely duplicated doc empties, dup_frac = 1") {
    val body = (0 until 9).map(i => s"t$i").mkString(" ")
    val r = run(8, 1L -> body, 2L -> body)
    assert(r(1L).getAs[String]("clean") === "")
    assert(r(1L).getAs[Double]("dup_frac") === 1.0)
    assert(r(1L).getAs[Long]("n_removed") === 9)
  }

  test("normalization applies before windowing (case/whitespace-insensitive match)") {
    val r = run(4,
      1L -> ("ALPHA beta   GAMMA delta " + uniq("p", 4)),
      2L -> ("alpha BETA gamma DELTA " + uniq("q", 4)))
    assert(r(1L).getAs[Long]("n_removed") === 4)
    assert(r(1L).getAs[String]("clean") === uniq("p", 4))
  }
}
