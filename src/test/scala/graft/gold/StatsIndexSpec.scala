package graft.gold

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StatsIndexSpec extends AnyFunSuite with SparkTestBase {

  private def clusteredDir(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("statsidx").toString
    (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(10, col("k"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("narrow range scan reads a fraction of the files, same answer") {
    val dir = clusteredDir()
    val full = spark.read.parquet(dir)
    val stats = StatsIndex.build(full, Seq("k"))
    val (pruned, read, total) =
      StatsIndex.prunedRangeScan(spark, stats, "k", 150L, 160L)
    assert(total == 10)
    assert(read <= 2, s"read $read of $total files")
    val expect = full.filter(col("k").between(150, 160))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == expect)
  }

  test("out-of-domain range reads zero files and keeps the schema") {
    val dir = clusteredDir()
    val stats = StatsIndex.build(spark.read.parquet(dir), Seq("k"))
    val (pruned, read, _) =
      StatsIndex.prunedRangeScan(spark, stats, "k", 5000L, 6000L)
    assert(read == 0)
    assert(pruned.count() == 0)
    assert(pruned.columns.toSeq == Seq("k", "v"))
  }

  test("stats admit false positives but never false negatives") {
    val dir = clusteredDir()
    val full = spark.read.parquet(dir)
    val stats = StatsIndex.build(full, Seq("k"))
    // Every row of the full answer appears in the pruned answer for many
    // random-ish ranges.
    for (lo <- Seq(0L, 99L, 500L, 777L, 999L)) {
      val hi = lo + 37L
      val (pruned, _, _) = StatsIndex.prunedRangeScan(spark, stats, "k", lo, hi)
      val a = pruned.collect().map(_.getLong(0)).toSet
      val b = full.filter(col("k").between(lo, hi)).collect().map(_.getLong(0)).toSet
      assert(a == b, s"range [$lo,$hi]")
    }
  }

  test("prunedRangeScan keeps Hive partition columns via basePath, even " +
      "when every candidate file sits in one partition directory") {
    import java.sql.Timestamp
    import spark.implicits._
    val path = Files.createTempDirectory("statsidx_part").toString
    val rows = (1 to 3).flatMap(d => (1 to 50).map(i =>
      ((d * 100 + i).toLong,
        Timestamp.valueOf(s"2026-01-0$d 10:00:00"))))
    PartitionedSink.writeDaily(rows.toDF("id", "ts"), path, "ts")
    val full = PartitionedSink.readDaily(spark, path)
    val stats = StatsIndex.build(full, Seq("__date"))
    val lo = java.sql.Date.valueOf("2026-01-02")
    val (pruned, read, total) =
      StatsIndex.prunedRangeScan(spark, stats, "__date", lo, lo)
    assert(read < total, s"read $read of $total")
    assert(pruned.columns.contains("__date"))
    val got = pruned.select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1 to 50).map(i => (200 + i).toLong).toSet)
  }
}
