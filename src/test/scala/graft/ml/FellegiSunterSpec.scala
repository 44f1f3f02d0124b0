package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FellegiSunterSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // Bimodal planted mixture: 300 duplicate-like pairs agree on each
  // field with ~90% (key-derived, deterministic), 300 non-match-like
  // pairs agree with ~10%.
  private def planted = (0 until 600).map { i =>
    val dup = i < 300
    def g(mod: Int) = if (dup) i % mod != 0 else i % mod == 0
    (i.toLong, dup, g(10), g(7), g(5))
  }.toDF("id", "truth", "g1", "g2", "g3")

  test("EM separates the planted mixture: m >> u, lambda near prevalence") {
    val p = FellegiSunter.emFit(planted, Seq("g1", "g2", "g3"), rounds = 5)
    assert(p.lambda > 0.35 && p.lambda < 0.65, s"lambda=${p.lambda}")
    p.m.zip(p.u).foreach { case (m, u) =>
      assert(m > 0.75, s"m=$m"); assert(u < 0.3, s"u=$u"); assert(m > u)
    }
  }

  test("fieldWeights readout: positive log2 weights, schema, rounding") {
    val fw = FellegiSunter.fieldWeights(planted, Seq("g1", "g2", "g3"),
      rounds = 3).collect()
    assert(fw.map(_.getString(0)).toSet == Set("g1", "g2", "g3"))
    fw.foreach { r =>
      assert(r.getDouble(3) > 0.0) // agreement carries positive weight
      assert(r.getDouble(4) == fw.head.getDouble(4)) // one shared lambda
    }
  }

  test("score classifies the planted truth at 0.5 with high accuracy") {
    val p = FellegiSunter.emFit(planted, Seq("g1", "g2", "g3"), rounds = 5)
    val scored = FellegiSunter.score(planted, Seq("g1", "g2", "g3"), p)
    val acc = scored.filter(col("is_match") === col("truth")).count() /
      600.0
    assert(acc > 0.85, s"accuracy=$acc")
  }

  test("quantized M-step sums make the fit partition-invariant") {
    val a = FellegiSunter.emFit(planted, Seq("g1", "g2", "g3"), rounds = 3)
    val b = FellegiSunter.emFit(planted.repartition(13),
      Seq("g1", "g2", "g3"), rounds = 3)
    assert(a == b)
  }

  test("degenerate all-agree input clamps instead of dividing by zero") {
    val allAgree = (0 until 50).map(i => (i.toLong, true, true, true))
      .toDF("id", "g1", "g2", "g3")
    val p = FellegiSunter.emFit(allAgree, Seq("g1", "g2", "g3"), rounds = 3)
    (p.m ++ p.u :+ p.lambda).foreach { x =>
      assert(x >= 1e-6 && x <= 0.999999, s"param out of clamp: $x")
    }
  }
}
