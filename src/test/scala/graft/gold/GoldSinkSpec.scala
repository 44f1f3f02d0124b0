package graft.gold

import java.nio.file.Files

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class GoldSinkSpec extends AnyFunSuite with SparkTestBase {

  test("blue/green publish alternates slots and readers see full snapshots") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_gold").toString
    val sink = new GoldSink(root)

    assert(sink.liveDir.isEmpty)
    val v1 = Seq((1, "a")).toDF("k", "v")
    val dir1 = sink.publish(Map("t" -> v1))
    assert(sink.liveDir.contains(dir1))
    assert(spark.read.parquet(s"$dir1/t").count() == 1)

    val v2 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val dir2 = sink.publish(Map("t" -> v2))
    assert(dir2 != dir1) // standby slot rebuilt
    assert(sink.liveDir.contains(dir2))
    assert(spark.read.parquet(s"${sink.liveDir.get}/t").count() == 2)

    // third publish swaps back onto the first slot
    val dir3 = sink.publish(Map("t" -> v1))
    assert(dir3 == dir1)
  }

  test("a table dropped from the publish set does not linger from two " +
      "publishes ago") {
    import java.nio.file.{Files => JFiles, Paths}
    import spark.implicits._
    val root = JFiles.createTempDirectory("graft_goldsink_drop").toString
    val sink = new GoldSink(root)
    val users = Seq((1L, "u")).toDF("id", "name")
    val orders = Seq((1L, 5.0)).toDF("id", "amt")
    sink.publish(Map("users" -> users, "orders" -> orders)) // slot A
    sink.publish(Map("users" -> users, "orders" -> orders)) // slot B
    sink.publish(Map("users" -> users))                     // slot A again
    val live = sink.liveDir.get
    assert(JFiles.exists(Paths.get(live, "users")))
    assert(!JFiles.exists(Paths.get(live, "orders")),
      "retired table served as live from a stale standby")
  }
}
