package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the distributed union+window as-of join reproduces the
  * reference's per-row 3-probe oracle
  * (`/root/reference/src/2_parse_engine.py:16-63`) on random data.
  */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  /** The reference's probe logic: exact/latest-earlier (backward) then
    * earliest-later (forward).
    */
  private def oracle(
      build: Seq[(String, Int, Long)], key: String, t: Int): Option[Long] = {
    val series = build.filter(_._1 == key)
    val backward = series.filter(_._2 <= t).sortBy(_._2).lastOption
    val forward = series.filter(_._2 > t).sortBy(_._2).headOption
    backward.orElse(forward).map(_._3)
  }

  test("matches the 3-probe oracle on random series (incl. gaps and cold keys)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val keys = Array("a", "b", "c")
    (1 to 10).foreach { round =>
      val buildRaw = Seq.fill(rng.nextInt(41))(
        (keys(rng.nextInt(3)), rng.nextInt(51), rng.nextLong().abs % 999 + 1))
      val probes = Seq.fill(rng.nextInt(40) + 1)(
        // "d": key with no build rows at all
        (if (rng.nextInt(4) == 3) "d" else keys(rng.nextInt(3)), rng.nextInt(51)))

      // Dedup (key, t) on the build side: multiple prices at the same
      // instant have no defined winner in either formulation.
      val build = buildRaw.groupBy(b => (b._1, b._2)).map(_._2.head).toSeq
      val probeDf = probes.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("pid", "key", "t")
      val buildDf = build.toDF("key", "bt", "value")

      val got = AsOfJoin.join(probeDf, buildDf, Seq("key"), "t", "bt", Seq("value"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap

      probes.zipWithIndex.foreach { case ((k, t), i) =>
        assert(got(i.toLong) == oracle(build, k, t),
          s"round $round probe ($k, $t) against ${build.filter(_._1 == k).sortBy(_._2)}")
      }
    }
  }

  test("backward-only strategy never looks forward") {
    import spark.implicits._
    val probe = Seq((1L, "a", 5)).toDF("pid", "key", "t")
    val build = Seq(("a", 10, 99L)).toDF("key", "bt", "value")
    val r = AsOfJoin.join(probe, build, Seq("key"), "t", "bt", Seq("value"),
      strategy = "backward").collect()
    assert(r.head.isNullAt(3))
  }
}
