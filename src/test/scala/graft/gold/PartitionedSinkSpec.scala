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
}
