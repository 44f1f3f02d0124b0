package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CountMinSpec extends AnyFunSuite with SparkTestBase {

  private def items(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("item")
  }

  test("estimates never undercount; absent items estimate small, not negative") {
    val data = items(Seq.fill(50)("hot") ++ (1 to 30).map(i => s"tail$i"))
    val sk = CountMin.build(data, "item", d = 4, w = 64)
    val probes = items(Seq("hot", "tail7", "missing"))
    val got = CountMin.estimate(sk, probes, "item", d = 4, w = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hot") >= 50L)
    assert(got("tail7") >= 1L)
    assert(got("missing") >= 0L && got("missing") <= 30L)
  }

  test("sketch table is bounded by d*w rows and merge equals one-shot build") {
    val a = items((1 to 500).map(i => s"w${i % 90}"))
    val b = items((1 to 300).map(i => s"w${i % 70}"))
    val skA = CountMin.build(a, "item", d = 3, w = 32)
    assert(skA.count() <= 3 * 32)
    val merged = CountMin.merge(skA, CountMin.build(b, "item", d = 3, w = 32))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val full = CountMin.build(a.unionByName(b), "item", d = 3, w = 32)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full)
  }

  test("join-size estimate upper-bounds the true size; exact when collision-free") {
    import spark.implicits._
    val a = items((1 to 200).map(i => s"k${i % 40}"))
    val b = items((1 to 60).map(i => s"k${i % 20}"))
    val est = CountMin.joinSizeEstimate(
      CountMin.build(a, "item", 4, 512), CountMin.build(b, "item", 4, 512))
      .head().getLong(0)
    val truth = a.join(b, Seq("item")).count()
    assert(est >= truth)
    // 40+20 keys in 512 buckets × 4 depths: min over depths is usually
    // collision-free — but only the BOUND is guaranteed, so assert a
    // generous overshoot ceiling rather than equality.
    assert(est <= truth * 2, s"est=$est truth=$truth")
  }

  test("deterministic under repartitioning") {
    val data = items((1 to 400).map(i => s"t${i * 7 % 111}"))
    val s1 = CountMin.build(data, "item", 4, 128)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val s2 = CountMin.build(data.repartition(9), "item", 4, 128)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(s1 == s2)
  }
}
