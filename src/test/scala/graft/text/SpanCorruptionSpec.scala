package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class SpanCorruptionSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val fixture = docs((1L to 20L).map(i =>
    i -> (1 to 37).map(j => s"w${(i * 31 + j * 7) % 23}").mkString(" ")): _*)

  private val sentinel = "<extra_id_(\\d+)>".r

  /** Splice target spans back into the input at their sentinels. */
  private def reconstruct(input: String, target: String): String = {
    val spans: Map[Int, String] =
      if (target == null) Map.empty
      else sentinel.findAllMatchIn(target).toSeq match {
        case ms =>
          ms.zipWithIndex.map { case (m, i) =>
            val end = if (i + 1 < ms.length) ms(i + 1).start else target.length
            m.group(1).toInt -> target.substring(m.end, end).trim
          }.toMap
      }
    input.split(" ").map {
      case s if sentinel.matches(s) => spans(sentinel.findFirstMatchIn(s).get.group(1).toInt)
      case t => t
    }.mkString(" ")
  }

  test("input + target reconstruct the original document exactly") {
    val out = SpanCorruption.corrupt(fixture, "doc_id", "text").collect()
    assert(out.length === 20)
    val original = fixture.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val in = r.getString(1)
      val tgt = if (r.isNullAt(2)) null else r.getString(2)
      assert(reconstruct(in, tgt) === original(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("sentinels number 0..K-1 in document order, matching the target") {
    val out = SpanCorruption.corrupt(fixture, "doc_id", "text").collect()
    var sawMask = false
    out.foreach { r =>
      val inIds = sentinel.findAllMatchIn(r.getString(1)).map(_.group(1).toInt).toSeq
      assert(inIds === inIds.indices.toSeq, s"doc ${r.getLong(0)}: $inIds")
      if (inIds.nonEmpty) {
        sawMask = true
        val tgtIds = sentinel.findAllMatchIn(r.getString(2)).map(_.group(1).toInt).toSeq
        assert(tgtIds === inIds)
      } else assert(r.isNullAt(2))
    }
    assert(sawMask, "fixture produced no masked spans at rate=3")
  }

  test("rate 0 never masks; rate 10 masks every block") {
    val none = SpanCorruption.corrupt(fixture, "doc_id", "text", rate = 0).collect()
    none.foreach { r =>
      assert(r.isNullAt(2))
      assert(!r.getString(1).contains("<extra_id_"))
    }
    val all = SpanCorruption.corrupt(fixture, "doc_id", "text",
      stride = 5, spanLen = 3, rate = 10).collect()
    all.foreach { r =>
      // 37 tokens → 8 blocks, all masked
      val ids = sentinel.findAllMatchIn(r.getString(1)).map(_.group(1).toInt).toSeq
      assert(ids === (0 until 8))
    }
  }

  test("masking is partitioning-invariant") {
    val a = SpanCorruption.corrupt(fixture.repartition(1), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = SpanCorruption.corrupt(fixture.repartition(13), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("spanLen == stride masks whole blocks contiguously") {
    val out = SpanCorruption.corrupt(fixture, "doc_id", "text",
      stride = 4, spanLen = 4, rate = 10).collect()
    out.foreach { r =>
      // every token masked → input is nothing but sentinels
      assert(r.getString(1).split(" ").forall(t => sentinel.matches(t)))
      assert(reconstruct(r.getString(1), r.getString(2)) ===
        fixture.collect().find(_.getLong(0) == r.getLong(0)).get.getString(1))
    }
  }
}
