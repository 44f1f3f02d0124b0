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

  test("candidate-blocked counts = all-pairs restricted to the candidates") {
    import spark.implicits._
    // 6 keys with overlapping membership across several words.
    val m = mem((for {
      k <- Seq("a", "b", "c", "d", "e", "f")
      i <- 0L until 40L if (i + k.head.toLong) % 3 != 0
    } yield k -> (i * 7 % 256)): _*)
    val bm = BitmapIndex.build(m, "k", "ord")
    val all = BitmapIndex.intersectCounts(bm)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // Candidates given in MIXED orientation with a duplicate and a
    // no-overlap-impossible pair; blocked result must equal the all-pairs
    // result filtered to those (canonicalized) pairs.
    val cand = Seq(("b", "a"), ("a", "b"), ("c", "e"), ("f", "d"))
      .toDF("key_a", "key_b")
    val blocked = BitmapIndex.intersectCounts(bm, cand)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = all.filter { case ((x, y), _) =>
      Set(("a", "b"), ("c", "e"), ("d", "f")).contains((x, y)) }
    assert(blocked === expected)
  }

  test("candidate-blocked never generates non-candidate pairs") {
    import spark.implicits._
    val m = mem((for (k <- 'a' to 'z'; i <- 0L until 20L)
      yield k.toString -> i): _*) // every key overlaps every key
    val bm = BitmapIndex.build(m, "k", "ord")
    val cand = Seq(("a", "b"), ("y", "z")).toDF("key_a", "key_b")
    val rows = BitmapIndex.intersectCounts(bm, cand).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("y", "z")))
    assert(rows.forall(_.getLong(2) === 20L))
  }

  test("word-join scoring stays partially aggregated (map-side combine)") {
    val m = mem((for (k <- Seq("a", "b"); i <- 0L until 200L) yield k -> i): _*)
    val plan = BitmapIndex.intersectCounts(BitmapIndex.build(m, "k", "ord"))
      .queryExecution.executedPlan.toString
    // Partial-mode hash aggregate must appear below the final one: the
    // (key_a, key_b) exchange carries combined per-partition sums, not one
    // row per bitmap word.
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"expected a partial aggregate in:\n$plan")
  }
}
