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

  test("distinct keys build CONCURRENTLY (per-key locks, not one " +
    "object lock) while one key still builds exactly once") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    // Each build blocks until the OTHER build has entered: under one
    // object-wide lock this deadlocks (the spec would time out); under
    // per-key locks both enter and release each other.
    val inA = new CountDownLatch(1)
    val inB = new CountDownLatch(1)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def mk(mine: CountDownLatch, other: CountDownLatch)(p: String): Unit = {
      builds.incrementAndGet()
      mine.countDown()
      assert(other.await(30, TimeUnit.SECONDS),
        "peer build never entered — shared builds are serialized")
      new java.io.File(p).mkdirs()
    }
    val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ta = new Thread(() => paths.add(
      SharedGraphs.ensure(spark, "/data/sfC", "specconc_a")(
        mk(inA, inB))))
    val tb = new Thread(() => paths.add(
      SharedGraphs.ensure(spark, "/data/sfC", "specconc_b")(
        mk(inB, inA))))
    ta.start(); tb.start()
    ta.join(60000); tb.join(60000)
    assert(!ta.isAlive && !tb.isAlive, "concurrent ensure deadlocked")
    assert(builds.get() == 2 && paths.size() == 2)
    // Same key again, from two racing threads: still exactly one build.
    val more = new java.util.concurrent.atomic.AtomicInteger(0)
    def once(p: String): Unit = { more.incrementAndGet();
      new java.io.File(p).mkdirs() }
    val rs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ts = (1 to 4).map(_ => new Thread(() => rs.add(
      SharedGraphs.ensure(spark, "/data/sfC", "specconc_same")(once))))
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    assert(more.get() == 1, s"same-key build ran ${more.get()} times")
    assert(rs.size() == 4 && new java.util.HashSet(rs).size() == 1)
    (paths.toArray(Array.empty[String]) ++
      rs.toArray(Array.empty[String]).take(1))
      .foreach(p => graft.ops.LocalFs.deleteRecursively(new java.io.File(p)))
  }
}
