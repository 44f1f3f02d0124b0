package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DpReleaseSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def rows = (0 until 400).map(i =>
    (s"g${i % 4}", (i % 100) * 10.0)).toDF("grp", "v")

  test("dpCounts: noise is calibrated (small at eps=1 vs n=100) and keyed") {
    val out = DataQuality.dpCounts(rows, Seq("grp"), epsilon = 1.0, salt = "dpc")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.size == 4)
    // True count is 100 per group; Laplace(1) noise is almost surely
    // within ±15 (P(|x|>15) = e^-15).
    out.values.foreach(v => assert(math.abs(v - 100.0) < 15.0, v))
    // Different groups draw different noise (keyed, not shared).
    assert(out.values.toSet.size > 1)
  }

  test("dpMean: clamp bounds the released mean into the clamped range") {
    val out = DataQuality.dpMean(rows, Seq("grp"), "v",
      lo = 0.0, hi = 100.0, epsilon = 1.0, salt = "dpm").collect()
    out.foreach { r =>
      val mean = r.getDouble(3)
      // Clamped values live in [0, 100]; noise at eps=1, n=100 moves the
      // mean by at most a few units almost surely.
      assert(mean > -10.0 && mean < 110.0, mean)
    }
  }

  test("deterministic and partition-invariant (seeded noise)") {
    val a = DataQuality.dpCounts(rows, Seq("grp"), 1.0, "dpc")
      .collect().map(_.toString).sorted.toSeq
    val b = DataQuality.dpCounts(rows.repartition(7), Seq("grp"), 1.0, "dpc")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("dpMean sum noise scales with max(|lo|,|hi|), not hi-lo") {
    // Clamp [100, 101]: under add/remove neighbors the clamped sum moves
    // by up to 101 when one contributor leaves — the sum scale must be
    // 101/(eps/2), not the 1/(eps/2) a (hi-lo) rule would use. The noise
    // is deterministic per key, so assert the exact released value.
    val one = Seq(("g", 100.5)).toDF("grp", "v")
    val got = DataQuality.dpMean(one, Seq("grp"), "v",
      lo = 100.0, hi = 101.0, epsilon = 1.0, salt = "dpm").head
    val expectedNoise = one
      .select(DataQuality.laplaceNoise(col("grp"), "dpm_s",
        lit(101.0 / 0.5)).as("x")).head.getDouble(0)
    assert(got.getDouble(1) ==
      math.rint((100.5 + expectedNoise) * 1e4) / 1e4 ||
      math.abs(got.getDouble(1) - (100.5 + expectedNoise)) < 1e-3,
      s"sum=${got.getDouble(1)} expected=${100.5 + expectedNoise}")
  }

  test("NULL groups draw their own noise; key cannot collide across columns") {
    val withNull = Seq((Option("a"), 1), (Option.empty[String], 1))
      .toDF("grp", "v")
    val out = DataQuality.dpCounts(withNull, Seq("grp"), 1.0, "dpc").collect()
    assert(out.length == 2)
    // Both rows released with real (non-null) noisy counts.
    out.foreach(r => assert(!r.isNullAt(1)))
    // ("a","b") vs ("ab","") must NOT share noise (separator-delimited).
    val two = Seq(("a", "b", 1), ("ab", "", 1)).toDF("g1", "g2", "v")
    val noisy = DataQuality.dpCounts(two, Seq("g1", "g2"), 1.0, "dpc")
      .collect().map(_.getDouble(2))
    assert(noisy(0) != noisy(1), "colliding group keys share noise")
  }

  test("dpCountsStable: suppresses below-threshold groups, keeps the rest") {
    // 3 big groups (100 each) + 5 singleton groups. At eps=1, delta=0.05
    // the threshold is 1 + 2 ln 40 ≈ 8.38: the singletons (1 ± Laplace(1))
    // fall below it almost surely, the 100s survive almost surely.
    val mixed = ((0 until 300).map(i => s"big${i % 3}") ++
      (0 until 5).map(i => s"lone$i")).toDF("grp")
    val out = DataQuality.dpCountsStable(mixed, Seq("grp"),
      epsilon = 1.0, delta = 0.05, salt = "t").collect()
    val kept = out.map(_.getString(0)).toSet
    assert(kept == Set("big0", "big1", "big2"), kept)
    // Threshold column carries the release parameters for the auditor.
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("delta")) == 0.05)
      assert(math.abs(r.getDouble(r.fieldIndex("threshold")) -
        (1.0 + 2.0 * math.log(40.0))) < 1e-3)
    }
  }

  test("plain releases stamp noise_scale, only the thresholded one epsilon") {
    // The plain variants leak group existence, so their output must not
    // claim an epsilon; the stability-thresholded release earns it.
    val counts = DataQuality.dpCounts(rows, Seq("grp"), epsilon = 2.0,
      salt = "dpc")
    assert(counts.columns.toSeq == Seq("grp", "noisy_count", "noise_scale"))
    assert(counts.head.getDouble(2) == 0.5) // b = 1/eps
    val means = DataQuality.dpMean(rows, Seq("grp"), "v",
      lo = 0.0, hi = 100.0, epsilon = 2.0, salt = "dpm")
    assert(!means.columns.contains("epsilon"))
    assert(means.head.getDouble(means.head.fieldIndex("noise_scale_sum"))
      == 100.0) // max(|lo|,|hi|)/(eps/2)
    val stable = DataQuality.dpCountsStable(rows, Seq("grp"),
      epsilon = 2.0, delta = 0.05, salt = "dps")
    assert(!stable.columns.contains("noise_scale"))
    assert(stable.columns.containsSlice(Seq("epsilon", "delta", "threshold")))
  }

  test("laplace noise distribution: symmetric, median near b ln 2") {
    val keys = (0 until 2000).map(_.toString).toDF("k")
    val xs = keys.select(DataQuality.laplaceNoise(col("k"), "t",
      lit(1.0)).as("x")).collect().map(_.getDouble(0)).sorted
    val pos = xs.count(_ > 0)
    assert(math.abs(pos - 1000) < 100, s"asymmetric: $pos positive")
    val medAbs = xs.map(math.abs).sorted.apply(1000)
    // Median of |Laplace(1)| is ln 2 ≈ 0.693.
    assert(medAbs > 0.55 && medAbs < 0.85, s"medAbs=$medAbs")
  }
}
