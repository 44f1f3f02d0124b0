package graft.gold

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PartitionedSinkSpec extends AnyFunSuite with SparkTestBase {

  test("daily layout: one dir per day, pruned scans, bounded files") {
    import spark.implicits._
    val rows = (1L to 300L).map { i =>
      (i, Timestamp.valueOf(s"2024-01-0${i % 3 + 1} 10:00:00"), s"msg $i")
    }.toDF("id", "Timestamp", "raw_content")
    val dir = Files.createTempDirectory("graft_part").toString + "/silver"

    PartitionedSink.writeDaily(rows, dir, sortCols = Seq("id"),
      maxRecordsPerFile = 40L)

    // One partition directory per day.
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("__date=")).sorted
    assert(dirs.toSeq == Seq("__date=2024-01-01", "__date=2024-01-02", "__date=2024-01-03"))

    // maxRecordsPerFile keeps 100-row days in >= 3 files each.
    val files = new java.io.File(dir + "/__date=2024-01-02")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 3)

    // Round-trip completeness + a partition-pruned scan.
    val back = PartitionedSink.readDaily(spark, dir)
    assert(back.count() == 300)
    val oneDay = back.filter(col("__date") === lit("2024-01-02"))
    assert(oneDay.count() == 100)
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-02"),
      s"expected pruned scan:\n$scan")
  }

  test("a second day's increment does not wipe the first day " +
      "(dynamic partition overwrite)") {
    import java.sql.Timestamp
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_psink_incr").toString
    val day1 = Seq((1L, Timestamp.valueOf("2026-01-01 10:00:00")))
      .toDF("id", "ts")
    val day2 = Seq((2L, Timestamp.valueOf("2026-01-02 10:00:00")))
      .toDF("id", "ts")
    PartitionedSink.writeDaily(day1, path, "ts")
    PartitionedSink.writeDaily(day2, path, "ts")
    val got = PartitionedSink.readDaily(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"day1 lost: $got")
    // Re-writing a day replaces only that day.
    val day2b = Seq((3L, Timestamp.valueOf("2026-01-02 11:00:00")))
      .toDF("id", "ts")
    PartitionedSink.writeDaily(day2b, path, "ts")
    val got2 = PartitionedSink.readDaily(spark, path)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 3L), got2.toString)
  }
}
