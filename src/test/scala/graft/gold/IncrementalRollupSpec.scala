package graft.gold

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalRollupSpec extends AnyFunSuite with SparkTestBase {

  test("N incremental merges equal one full recompute, bit-for-bit") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val facts = (1 to 3000).map { i =>
      (s"day${i % 3}", s"u${rng.nextInt(40)}", BigDecimal(rng.nextInt(100000), 2))
    }.toDF("day", "user", "v")

    // Three daily increments merged into a running state...
    val days = Seq("day0", "day1", "day2")
    val state = days.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      case (st, d) =>
        val inc = IncrementalRollup.incrementOf(
          facts.filter(col("day") === d), Seq("user"), "v")
        Some(st.fold(inc)(s => IncrementalRollup.merge(s, inc)))
    }.get

    // ...must equal aggregating all history at once.
    val full = IncrementalRollup.incrementOf(facts, Seq("user"), "v")
    val got = state.orderBy("user").collect().toSeq
    val want = full.orderBy("user").collect().toSeq
    assert(got == want)
  }

  test("merge keeps one row per key and sums state exactly") {
    import spark.implicits._
    val st = Seq(("a", 2L, BigDecimal("10.50")), ("b", 1L, BigDecimal("1.00")))
      .toDF("user", "cnt", "total")
      .withColumn("total", col("total").cast("decimal(18,2)"))
    val inc = Seq(("a", 3L, BigDecimal("0.50")), ("c", 1L, BigDecimal("9.99")))
      .toDF("user", "cnt", "total")
      .withColumn("total", col("total").cast("decimal(18,2)"))
    val out = IncrementalRollup.merge(st, inc)
      .as[(String, Long, BigDecimal)].collect().sortBy(_._1).toList
    assert(out.map(r => (r._1, r._2, r._3.toString)) == List(
      ("a", 5L, "11.00"), ("b", 1L, "1.00"), ("c", 1L, "9.99")))
  }

  test("merge preserves the increment's decimal(28,2) total type - no " +
      "narrowing cast, no schema flip-flop between producers") {
    import spark.implicits._
    val facts = Seq(("a", 10.0), ("a", 2.5)).toDF("k", "v")
    val inc = IncrementalRollup.incrementOf(facts, Seq("k"), "v")
    val merged = IncrementalRollup.merge(inc, inc)
    assert(merged.schema("total").dataType.sql ==
      inc.schema("total").dataType.sql)
    assert(inc.schema("total").dataType.sql == "DECIMAL(28,2)")
  }
}
