package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite with SparkTestBase {

  private def doc(nTokens: Int) =
    (1L, (1 to nTokens).map(i => s"t$i").mkString(" "))

  private def chunksOf(nTokens: Int, size: Int, overlap: Int) = {
    import spark.implicits._
    Chunker.chunk(Seq(doc(nTokens)).toDF("doc_id", "text"),
      "doc_id", "text", size, overlap)
      .as[(Long, Int, Int, String)].collect().sortBy(_._2).toList
  }

  test("short document yields exactly one (possibly short) chunk") {
    val out = chunksOf(7, 50, 10)
    assert(out.map(c => (c._2, c._3)) == List((0, 7)))
    assert(out.head._4 == (1 to 7).map(i => s"t$i").mkString(" "))
  }

  test("chunk boundaries stride by size-overlap and overlap correctly") {
    // 90 tokens, size 50, overlap 10 → chunks at 0..49 and 40..89.
    val out = chunksOf(90, 50, 10)
    assert(out.map(c => (c._2, c._3)) == List((0, 50), (1, 50)))
    assert(out(0)._4.endsWith(" t50") && out(1)._4.startsWith("t41 "))
  }

  test("last truncated chunk still covers the final token") {
    // 91 tokens → third chunk 80..90 (11 tokens).
    val out = chunksOf(91, 50, 10)
    assert(out.map(c => (c._2, c._3)) == List((0, 50), (1, 50), (2, 11)))
    assert(out(2)._4.endsWith(" t91"))
  }

  test("boundary case: exactly chunkSize tokens is one full chunk") {
    assert(chunksOf(50, 50, 10).map(c => (c._2, c._3)) == List((0, 50)))
    // 51 tokens → second chunk covers 40..50.
    assert(chunksOf(51, 50, 10).map(c => (c._2, c._3)) == List((0, 50), (1, 11)))
  }
}
