package graft.expr

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CompressStatsSpec extends AnyFunSuite with SparkTestBase {

  private def stats(texts: Seq[String]): Seq[(Long, Long)] = {
    import spark.implicits._
    texts.toDF("t")
      .select(CompressStats.stats(col("t")).as("cs"))
      .select("cs.utf8_bytes", "cs.deflate_bytes")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("repetitive text compresses far below varied text") {
    val rep = "spam " * 400
    val varied = (0 until 400).map(i => s"w${i * 7919}").mkString(" ")
    val Seq((repOrig, repComp), (varOrig, varComp)) = stats(Seq(rep, varied))
    assert(repOrig == rep.getBytes("UTF-8").length.toLong)
    assert(varOrig == varied.getBytes("UTF-8").length.toLong)
    // The 400x-repeated token collapses; the varied one compresses only
    // modestly (numeric tokens still deflate ~2x).
    assert(repComp * 20 < repOrig, s"repetitive: $repComp of $repOrig")
    assert(varComp * 3 > varOrig, s"varied: $varComp of $varOrig")
    // And the ratios are far apart: repetitive at least 5x more compressible.
    assert(repComp * varOrig * 5 < varComp * repOrig)
  }

  test("empty string and multi-byte UTF-8 byte accounting") {
    val Seq((e0, _), (u0, _)) = stats(Seq("", "héllo • 世界"))
    assert(e0 == 0L)
    assert(u0 == "héllo • 世界".getBytes("UTF-8").length.toLong)
  }

  test("null input yields null struct; results stable across partitions") {
    import spark.implicits._
    val df = Seq(Some("abc abc abc"), None, Some("xyz")).toDF("t")
    val got = df.select(CompressStats.stats(col("t")).as("cs")).collect()
    assert(got.count(_.isNullAt(0)) == 1)

    val texts = (0 until 50).map(i => s"doc $i " + ("na" * (i % 13)))
    val one = texts.toDF("t").coalesce(1)
      .select(CompressStats.stats(col("t")).as("c")).select("c.deflate_bytes")
      .collect().map(_.getLong(0)).toSeq
    val many = texts.toDF("t").repartition(7)
      .select(CompressStats.stats(col("t")).as("c")).select("c.deflate_bytes")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(one.sorted == many)
  }
}
