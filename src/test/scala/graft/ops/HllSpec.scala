package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite with SparkTestBase {

  private def items(n: Int, parts: Int = 4) = {
    import spark.implicits._
    (0 until n).map(i => s"item_$i").toDF("item").repartition(parts)
  }

  private def est(df: org.apache.spark.sql.DataFrame): Double =
    Hll.estimate(df).collect().head.getDouble(0)

  test("estimate lands inside the published 3-sigma bound (rsd 6.5%)") {
    for (n <- Seq(1000, 5000, 20000)) {
      val e = est(Hll.registers(items(n), "item"))
      assert(math.abs(e - n) <= 3 * 1.04 / 16.0 * n + 1,
        s"n=$n est=$e off by ${math.abs(e - n) / n}")
    }
  }

  test("merge of per-group sketches is bit-identical to one global sketch") {
    import spark.implicits._
    val tagged = (0 until 3000)
      .map(i => (s"g${i % 7}", s"item_${i % 1100}")).toDF("g", "item")
    val merged = Hll.merge(Hll.registers(tagged, "item", Seq("g")).drop("g"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val oneShot = Hll.registers(tagged, "item")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(merged === oneShot)
  }

  test("estimate is partitioning-invariant") {
    val a = est(Hll.registers(items(4000, parts = 1), "item"))
    val b = est(Hll.registers(items(4000, parts = 13), "item"))
    assert(a === b)
  }

  test("small cardinalities take the linear-counting branch") {
    val e = est(Hll.registers(items(3), "item"))
    assert(math.abs(e - 3.0) <= 1.0, s"got $e")
    // formula check: m * ln(m / V) with V = untouched registers
    val present = Hll.registers(items(3), "item").count()
    val expected = 256.0 * math.log(256.0 / (256.0 - present))
    assert(e === expected)
  }

  test("empty input estimates zero distinct") {
    assert(est(Hll.registers(items(0), "item")) === 0.0)
  }

  test("register table is bounded by m rows regardless of input size") {
    assert(Hll.registers(items(20000), "item").count() <= Hll.M)
  }
}
