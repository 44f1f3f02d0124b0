package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The self-routing as-of join: hot probe keys must be detected and
  * salted WITHOUT caller opt-in, cold profiles must take the plain native
  * leg, broadcast-sized builds must skip detection entirely — and every
  * route must return rows identical to the reference unsalted join.
  */
class AsOfJoinAutoSpec extends AnyFunSuite with SparkTestBase {

  // ~90% of probes on one key (the planted straggler), two cold keys.
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

  private def uniform = {
    import spark.implicits._
    val probes = (0 until 5000).map(i => (i.toLong, s"k${i % 500}", i % 997))
      .toDF("event_id", "item", "t")
    val build = (for (k <- 0 until 500; i <- 0 until 3)
      yield (s"k$k", i * 111, i * 100L + k))
      .toDF("item", "bt", "price")
    (probes, build)
  }

  private def withoutBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skewProfile flags the planted hot key and sizes the salt sensibly") {
    val (probes, _) = planted
    val p = AsOfJoin.skewProfile(probes, Seq("item"), sampleFraction = 1.0)
    assert(p.hot, p.toString)
    assert(p.maxKeyRows == 4500L && p.totalRows == 5000L, p.toString)
    assert(p.suggestedSalts >= 2, p.toString)
    // Suggested salts split the hot key back to ~average-partition chunks.
    assert(p.maxKeyRows.toDouble / p.suggestedSalts <=
      2 * math.max(1.0, p.avgPartitionRows), p.toString)
  }

  test("skewProfile under sampling still detects a 90%-share key") {
    val (probes, _) = planted
    val p = AsOfJoin.skewProfile(probes, Seq("item"), sampleFraction = 0.05)
    assert(p.hot, p.toString)
  }

  test("skewProfile does not flag a uniform key distribution") {
    val (probes, _) = uniform
    val p = AsOfJoin.skewProfile(probes, Seq("item"), sampleFraction = 1.0)
    assert(!p.hot, p.toString)
  }

  test("skewProfile on an empty probe is calm") {
    val (probes, _) = planted
    val p = AsOfJoin.skewProfile(probes.filter(lit(false)), Seq("item"))
    assert(!p.hot && p.totalRows == 0L, p.toString)
  }

  test("hot profile routes to the salted leg; rows identical to unsalted") {
    val (probes, build) = planted
    withoutBroadcast {
      val auto = AsOfJoin.joinAuto(probes, build, Seq("item"), "t", "bt",
        Seq("price"), sampleFraction = 1.0)
      val plan = auto.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salted leg did not fire:\n$plan")
      val want = AsOfJoin.join(probes, build, Seq("item"), "t", "bt",
        Seq("price")).collect().map(_.toSeq).toSet
      assert(auto.collect().map(_.toSeq).toSet == want)
    }
  }

  test("automatic salt bounds the hot key's per-group share") {
    val (probes, _) = planted
    val p = AsOfJoin.skewProfile(probes, Seq("item"), sampleFraction = 1.0)
    // The salted leg clusters on (item, __salt) with the default salt
    // source = the probe-time column; measure the actual group sizes the
    // exec would see for the hot key.
    val buckets = probes.filter(col("item") === "hot")
      .groupBy(pmod(xxhash64(col("t")), lit(p.suggestedSalts.toLong)))
      .count().collect().map(_.getLong(1))
    val unsaltedMax = 4500L
    assert(buckets.max < unsaltedMax / 2,
      s"salting did not materially split the hot key: ${buckets.toSeq}")
  }

  test("cold profile routes to the plain native leg (no salt in plan)") {
    val (probes, build) = uniform
    withoutBroadcast {
      val auto = AsOfJoin.joinAuto(probes, build, Seq("item"), "t", "bt",
        Seq("price"), sampleFraction = 1.0)
      val plan = auto.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan)
      assert(!plan.contains("__salt"), s"unexpected salting:\n$plan")
      val want = AsOfJoin.join(probes, build, Seq("item"), "t", "bt",
        Seq("price")).collect().map(_.toSeq).toSet
      assert(auto.collect().map(_.toSeq).toSet == want)
    }
  }

  test("broadcast-sized build skips detection and salting entirely") {
    val (probes, build) = planted
    // Default threshold (10 MB) dwarfs the toy build: the wrapper must
    // return the plain native join even though the probe is skewed —
    // BroadcastAsOfJoinExec never shuffles the probe, so skew is moot.
    val auto = AsOfJoin.joinAuto(probes, build, Seq("item"), "t", "bt",
      Seq("price"))
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("__salt"), plan)
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    val want = AsOfJoin.join(probes, build, Seq("item"), "t", "bt",
      Seq("price")).collect().map(_.toSeq).toSet
    assert(auto.collect().map(_.toSeq).toSet == want)
  }

  test("all three strategies agree with the window-form join under auto") {
    val (probes, build) = planted
    withoutBroadcast {
      Seq("backward", "forward", "backward_then_forward").foreach { strat =>
        val want = AsOfJoin.join(probes, build, Seq("item"), "t", "bt",
          Seq("price"), strat).collect().map(_.toSeq).toSet
        val got = AsOfJoin.joinAuto(probes, build, Seq("item"), "t", "bt",
          Seq("price"), strategy = strat, sampleFraction = 1.0)
          .collect().map(_.toSeq).toSet
        assert(got == want, strat)
      }
    }
  }
}
