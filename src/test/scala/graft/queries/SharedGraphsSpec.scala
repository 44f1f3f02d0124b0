package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The harness-level build-once contract: a shared tree's builder runs
  * exactly once per (app, dir, name) no matter how many consumers
  * resolve it, distinct names/dirs get distinct trees, and the paths
  * carry the application id (concurrent-run isolation AND the stale-tmp
  * sweep's live-app guard both key on it).
  */
class SharedGraphsSpec extends AnyFunSuite with SparkTestBase {

  test("ensure builds once per key, isolates names and dirs, and keys " +
    "paths by appId") {
    var builds = 0
    def build(p: String): Unit = {
      builds += 1
      val d = new java.io.File(p)
      d.mkdirs()
      java.nio.file.Files.writeString(d.toPath.resolve("marker"), "x")
    }
    val p1 = SharedGraphs.ensure(spark, "/data/sfA", "specfix")(build)
    val p2 = SharedGraphs.ensure(spark, "/data/sfA", "specfix")(build)
    assert(p1 == p2 && builds == 1, s"rebuilt: $builds")
    assert(new java.io.File(p1, "marker").exists())
    val p3 = SharedGraphs.ensure(spark, "/data/sfB", "specfix")(build)
    val p4 = SharedGraphs.ensure(spark, "/data/sfA", "specother")(build)
    assert(builds == 3)
    assert(Set(p1, p3, p4).size == 3, "keys must not collide")
    val appId = spark.sparkContext.applicationId
    for (p <- Seq(p1, p3, p4)) {
      assert(p.contains(appId), p)
      assert(new java.io.File(p).getName.startsWith("graft_gidx_"),
        s"outside the sweep's prefix family: $p")
    }
    Seq(p1, p3, p4).foreach(p =>
      graft.ops.LocalFs.deleteRecursively(new java.io.File(p)))
  }
}
