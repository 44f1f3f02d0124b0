package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite with SparkTestBase {

  /** Two keys with a controlled overlap: a holds 0..1999, b holds
    * 1500..3499 → intersection 500, union 3500.
    */
  private def items(parts: Int = 4): DataFrame = {
    import spark.implicits._
    ((0 until 2000).map(i => ("a", s"item_$i")) ++
      (1500 until 3500).map(i => ("b", s"item_$i")))
      .toDF("k", "item").repartition(parts)
  }

  private def estimates(k: Int) = {
    val sk = KmvSketch.build(items(), "k", "item", k)
    KmvSketch.pairEstimates(sk, k).collect().head
  }

  test("unsaturated sketches give EXACT intersection and union") {
    val r = estimates(k = 8192) // both sets < k → complete sketches
    assert(!r.getBoolean(2))
    assert(r.getDouble(3) === 500.0)
    assert(r.getDouble(4) === 3500.0)
  }

  test("saturated sketches estimate within the published error") {
    val r = estimates(k = 512)
    assert(r.getBoolean(2))
    // rsd ~ 1/sqrt(rho); generous 5-sigma envelopes
    assert(math.abs(r.getDouble(3) - 500.0) <= 250.0, s"inter=${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 3500.0) <= 600.0, s"union=${r.getDouble(4)}")
  }

  test("sketch table is bounded by k rows per key") {
    val sk = KmvSketch.build(items(), "k", "item", 64)
    assert(sk.groupBy(col("key")).count().collect().forall(_.getLong(1) <= 64))
  }

  test("build is partitioning-invariant") {
    val a = KmvSketch.build(items(1), "k", "item", 128)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val b = KmvSketch.build(items(13), "k", "item", 128)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === b)
  }

  test("disjoint sets estimate an empty intersection") {
    import spark.implicits._
    val d = ((0 until 500).map(i => ("a", s"x_$i")) ++
      (0 until 500).map(i => ("b", s"y_$i"))).toDF("k", "item")
    val r = KmvSketch.pairEstimates(KmvSketch.build(d, "k", "item", 4096), 4096)
      .collect().head
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 1000.0)
  }
}
