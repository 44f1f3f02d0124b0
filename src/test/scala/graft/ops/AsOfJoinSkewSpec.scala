package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The salted as-of join must (a) return exactly the unsalted result on a
  * planted hot key, for every strategy and both physical paths, and (b)
  * actually spread the hot key: no salt bucket may hold more than a
  * bounded multiple of the fair share. (b) is the scale property — both
  * as-of execs shuffle on the key, AQE's OptimizeSkewedJoin never
  * rewrites custom execs, so explicit salting is the hot-key answer.
  */
class AsOfJoinSkewSpec extends AnyFunSuite with SparkTestBase {

  // One hot key with ~90% of the probes + two cold keys; build series of
  // 37 price points per key.
  private def planted = {
    import spark.implicits._
    val probes = ((0 until 4500).map(i => (i.toLong, "hot", i % 997)) ++
      (0 until 300).map(i => (10000L + i, "cold_a", i % 211)) ++
      (0 until 200).map(i => (20000L + i, "cold_b", i % 151)))
      .toDF("event_id", "item", "t")
    val build = (for (k <- Seq("hot", "cold_a", "cold_b"); i <- 0 until 37)
      yield (k, i * 27 + (k.length % 5), i * 100L + k.hashCode % 7))
      .toDF("item", "bt", "price")
    (probes, build)
  }

  test("salted result is identical to the unsalted join, all strategies") {
    val (probes, build) = planted
    Seq("backward", "forward", "backward_then_forward").foreach { strat =>
      val want = AsOfJoin.join(probes, build, Seq("item"), "t", "bt",
        Seq("price"), strat).collect().map(_.toSeq).toSet
      val got = AsOfJoin.saltedJoin(probes, build, Seq("item"), "t", "bt",
        Seq("price"), saltCol = "event_id", numSalts = 8, strategy = strat)
        .collect().map(_.toSeq).toSet
      assert(got == want, strat)
    }
  }

  test("salt bounds the hot key's per-partition share") {
    val (probes, _) = planted
    val numSalts = 8
    // The exec clusters on (item, __salt); the hot key's rows land in
    // numSalts groups. xxhash64 over a high-cardinality column spreads
    // near-uniformly: bound every bucket by 2x the fair share.
    val buckets = probes.filter(col("item") === "hot")
      .groupBy(pmod(xxhash64(col("event_id")), lit(numSalts.toLong)))
      .count().collect().map(_.getLong(1))
    assert(buckets.length == numSalts, "hot key must occupy every salt")
    val fair = 4500.0 / numSalts
    assert(buckets.max <= 2 * fair,
      s"worst bucket ${buckets.max} exceeds 2x fair share $fair")
  }

  test("salted plan clusters on (keys, salt) through the native exec") {
    val (probes, build) = planted
    val df = AsOfJoin.saltedJoin(probes, build, Seq("item"), "t", "bt",
      Seq("price"), saltCol = "event_id", numSalts = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("__salt"), s"salt missing from the plan:\n$plan")
  }

  test("unmatched probe keys survive salting with null values") {
    import spark.implicits._
    val probes = Seq((1L, "ghost", 5), (2L, "hot", 5)).toDF("event_id", "item", "t")
    val build = Seq(("hot", 3, 99L)).toDF("item", "bt", "price")
    val got = AsOfJoin.saltedJoin(probes, build, Seq("item"), "t", "bt",
      Seq("price"), saltCol = "event_id", numSalts = 4)
      .collect().map(r => r.getLong(0) -> r.get(3)).toMap
    assert(got == Map(1L -> null, 2L -> 99L))
  }
}
