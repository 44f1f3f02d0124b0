package graft.gold

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactorSpec extends AnyFunSuite with SparkTestBase {

  test("fragmented directory compacts to few files with identical content") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString
    val src = s"$dir/src"
    val dest = s"$dir/dest"
    (1 to 5000).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
      .repartition(50) // plant the small-files problem
      .write.parquet(src)
    val (n0, bytes) = Compactor.stats(spark, src)
    assert(n0 == 50)

    assert(Compactor.shouldCompact(spark, src, targetFileBytes = bytes * 2, minFiles = 8))
    val nOut = Compactor.compact(spark, src, dest, targetFileBytes = bytes * 2, minFiles = 8)
    assert(nOut == 1)
    assert(Compactor.stats(spark, dest)._1 == 1)

    val a = spark.read.parquet(src).orderBy("id").collect().toSeq
    val b = spark.read.parquet(dest).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("healthy directory is left alone") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact2").toString
    val src = s"$dir/src"
    (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .coalesce(2).write.parquet(src)
    // Few, adequately sized files for this tiny target: no-op.
    assert(!Compactor.shouldCompact(spark, src, targetFileBytes = 10L, minFiles = 8))
    assert(Compactor.compact(spark, src, s"$dir/dest", targetFileBytes = 10L, minFiles = 8) == 0)
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/dest")))
  }

  test("compacting a schema-evolved directory preserves columns only " +
      "newer files carry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_evo").toString
    val src = s"$dir/src"
    val dest = s"$dir/dest"
    (1 to 200).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartition(10).write.parquet(src)
    (201 to 400).map(i => (i.toLong, s"r$i", i * 2.0))
      .toDF("id", "v", "discount")
      .repartition(10).write.mode("append").parquet(src)
    val nOut = Compactor.compact(spark, src, dest,
      targetFileBytes = 1L << 30, minFiles = 2)
    assert(nOut == 1)
    val out = spark.read.option("mergeSchema", "true").parquet(dest)
    assert(out.columns.toSet == Set("id", "v", "discount"))
    assert(out.filter(col("discount").isNotNull).count() == 200)
    assert(out.count() == 400)
  }
}
