package graft.gold

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class EvolutionSpec extends AnyFunSuite with SparkTestBase {

  test("added columns surface with null backfill; required-column gate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolution").toString
    (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .write.mode("append").parquet(dir)
    (10L until 20L).map(i => (i, s"v$i", s"s${i % 3}")).toDF("k", "v", "source")
      .write.mode("append").parquet(dir)

    val merged = Evolution.readMerged(spark, dir)
    assert(merged.columns.toSet == Set("k", "v", "source"))
    assert(merged.count() == 20)
    // Old files read as NULL source; new files keep theirs.
    assert(merged.filter(col("source").isNull).count() == 10)
    assert(merged.filter(col("k") === 15L).head().getString(2) == "s0")

    intercept[IllegalArgumentException] {
      Evolution.readMerged(spark, dir, required = Seq("sourec"))
    }

    val rates = Evolution.nullRates(merged).head()
    assert(rates.getDouble(0) == 0.0)       // k
    assert(rates.getDouble(2) == 0.5)       // source: half the rows predate it
  }
}
