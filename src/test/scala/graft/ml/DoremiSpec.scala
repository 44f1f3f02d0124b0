package graft.ml

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DoremiSpec extends AnyFunSuite with SparkTestBase {

  private def df(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("dom", "loss_milli", "ref_milli").repartition(3)
  }

  private def weights(rows: Seq[(String, Long, Long)],
      rounds: Int = 8, eta: Double = 0.5, smoothing: Double = 0.05) =
    Doremi.mixtureWeights(df(rows), "dom", "loss_milli", "ref_milli",
        rounds, eta, smoothing)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  test("hand-stepped EG recursion on two domains, one round") {
    // a: excess = (3000-1000)/1000/1 = 2.0; b: excess = 0 (clipped)
    // stepped: 0.5*e^1, 0.5*e^0; z = 0.5(e+1)
    // alpha_a = 0.9*e/(e+1) + 0.05; alpha_b = 0.9/(e+1) + 0.05
    val got = weights(Seq(("a", 3000L, 1000L), ("b", 500L, 900L)),
      rounds = 1, eta = 0.5, smoothing = 0.1)
    val e = math.exp(1.0)
    assert(got("a")._2 == 2.0 && got("b")._2 == 0.0)
    assert(math.abs(got("a")._3 - (0.9 * e / (e + 1) + 0.05)) < 1e-12)
    assert(math.abs(got("b")._3 - (0.9 * 1 / (e + 1) + 0.05)) < 1e-12)
  }

  test("zero excess everywhere stays exactly uniform") {
    val got = weights(Seq(("a", 100L, 500L), ("b", 200L, 500L),
      ("c", 300L, 500L), ("d", 400L, 500L)))
    got.values.foreach { case (_, ex, w) =>
      assert(ex == 0.0)
      assert(w == 0.25)
    }
  }

  test("weights form a distribution and order by excess") {
    val got = weights(Seq(("a", 9000L, 1000L), ("a", 7000L, 1000L),
      ("b", 4000L, 1000L), ("c", 1500L, 1000L), ("d", 800L, 1000L)))
    val total = got.values.map(_._3).sum
    assert(math.abs(total - 1.0) < 1e-12)
    assert(got("a")._1 == 2L) // n_docs counted per domain
    assert(got("a")._3 > got("b")._3 && got("b")._3 > got("c")._3 &&
      got("c")._3 > got("d")._3)
  }

  test("smoothing floors every domain above c/k") {
    val got = weights(Seq(("hot", 50000L, 0L), ("cold", 0L, 50000L)),
      rounds = 20, eta = 1.0, smoothing = 0.04)
    assert(got("cold")._3 >= 0.02)
    assert(got("hot")._3 > 0.9)
  }

  test("null domains are excluded, not aggregated as a domain") {
    import spark.implicits._
    val rows = Seq((Some("a"), 2000L, 1000L), (None, 9000L, 0L),
      (Some("b"), 500L, 1000L))
      .toDF("dom", "loss_milli", "ref_milli")
    val got = Doremi.mixtureWeights(rows, "dom", "loss_milli", "ref_milli")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b"))
  }

  test("null losses are unmeasured rows, not diluted into the domain") {
    import spark.implicits._
    // With the null row counted, excess would be (4000-2000)/(1000*2)=1.0;
    // over the measured row alone it is (4000-1000)/1000 = 3.0.
    val rows = Seq(("a", Some(4000L), Some(1000L)),
      ("a", None, Some(1000L)), ("b", Some(500L), None),
      ("b", Some(2000L), Some(2000L)))
      .toDF("dom", "loss_milli", "ref_milli")
    val got = Doremi.mixtureWeights(rows, "dom", "loss_milli", "ref_milli")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("a") == ((1L, 3.0)))
    assert(got("b") == ((1L, 0.0)))
  }

  test("empty input yields an empty frame with the output schema") {
    val out = Doremi.mixtureWeights(df(Nil), "dom", "loss_milli", "ref_milli")
    assert(out.columns.toSeq == Seq("domain", "n_docs", "excess", "weight"))
    assert(out.count() == 0)
  }

  test("non-categorical domain column fails loudly") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => (s"d$i", i, 0L))
      .toDF("dom", "loss_milli", "ref_milli")
    intercept[IllegalArgumentException] {
      Doremi.mixtureWeights(rows, "dom", "loss_milli", "ref_milli",
        maxDomains = 10)
    }
  }

  test("result is partitioning-invariant") {
    val rows = (1L to 200L).map(i =>
      ("d" + (i % 7), 1000L + (i * 13) % 700, 1200L))
    val a = weights(rows)
    val b = Doremi.mixtureWeights(df(rows).repartition(11), "dom",
        "loss_milli", "ref_milli")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (d, (_, _, w)) => assert(w == b(d)) }
  }
}
