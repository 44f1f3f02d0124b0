package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SeqPackSpec extends AnyFunSuite with SparkTestBase {

  private def docs(counts: (Long, Long)*) = {
    import spark.implicits._
    counts.toSeq.toDF("doc_id", "n")
  }

  test("hand-computed spans at window=10") {
    // offsets: d1 0, d2 7, d3 12, d4 30 — stream length 31.
    val got = SeqPack.concatChunk(
        docs(1L -> 7L, 2L -> 5L, 3L -> 18L, 4L -> 1L), "doc_id", col("n"), 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 7L, 0L, 0L, 1L),   // tokens 0-6
      (2L, 5L, 0L, 1L, 2L),   // tokens 7-11 straddle the first boundary
      (3L, 18L, 1L, 2L, 2L),  // tokens 12-29
      (4L, 1L, 3L, 3L, 1L)))  // token 30
  }

  test("zero-token docs are excluded; spans tile the stream exactly") {
    val got = SeqPack.concatChunk(
        docs(1L -> 0L, 2L -> 25L, 3L -> 0L, 4L -> 5L), "doc_id", col("n"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((2L, 0L, 2L), (4L, 2L, 2L)))
  }

  test("partition-invariant and equal to the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val base = docs((1L to 200L).map(i => i -> (i % 13)): _*)
    val expect = base.filter(col("n") > 0)
      .withColumn("off", coalesce(sum("n").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), expr("off div 16").as("first_seq"),
        expr("(off + n - 1) div 16").as("last_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    for (parts <- Seq(1, 7)) {
      val got = SeqPack.concatChunk(base.repartition(parts), "doc_id",
          col("n"), 16)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == expect)
    }
  }
}
