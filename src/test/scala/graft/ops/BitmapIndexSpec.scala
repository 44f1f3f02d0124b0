package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class BitmapIndexSpec extends AnyFunSuite with SparkTestBase {

  private def mem(rows: (String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "ord")
  }

  test("cardinality matches distinct membership count, duplicates free") {
    val m = mem("a" -> 0L, "a" -> 5L, "a" -> 5L, "a" -> 63L, "a" -> 64L,
      "b" -> 127L, "b" -> 128L)
    val cards = BitmapIndex.cardinality(BitmapIndex.build(m, "k", "ord"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cards === Map("a" -> 4L, "b" -> 2L))
  }

  test("bit 63 (sign bit of the word) counts correctly") {
    val m = mem("a" -> 63L, "b" -> 63L, "b" -> 62L)
    val co = BitmapIndex.intersectCounts(BitmapIndex.build(m, "k", "ord"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(co === Map(("a", "b") -> 1L))
  }

  test("intersection counts match naive set intersection across words") {
    val as = Seq(1L, 64L, 130L, 200L, 4000L)
    val bs = Seq(64L, 130L, 201L, 4000L, 9000L)
    val cs = Seq(7L)
    val m = mem(as.map("a" -> _) ++ bs.map("b" -> _) ++ cs.map("c" -> _): _*)
    val co = BitmapIndex.intersectCounts(BitmapIndex.build(m, "k", "ord"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(co === Map(("a", "b") -> as.toSet.intersect(bs.toSet).size.toLong))
    // c shares nothing → absent
    assert(!co.keySet.exists(p => p._1 == "c" || p._2 == "c"))
  }

  test("bitmap rows are bounded by maxOrd/64 words per key") {
    val m = mem((0L until 1000L).map("a" -> _): _*)
    assert(BitmapIndex.build(m, "k", "ord").count() === 16L) // 1000/64 rounded up
  }

  test("empty input builds an empty index") {
    assert(BitmapIndex.build(mem(), "k", "ord").count() === 0L)
  }
}
