package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite with SparkTestBase {

  test("exact quartile banding splits 1..100 into 25/25/25/25") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("x").repartition(5)
    val out = Quantiles.bucketize(df, "x", Seq(0.25, 0.5, 0.75), exact = true)
      .groupBy("q_bucket").agg(count(lit(1)).as("n"), max("x").as("mx"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toList ==
      List((0, 25L), (1, 25L), (2, 25L), (3, 25L)))
    // boundaries (25.75, 50.5, 75.25) interpolate strictly between points
    assert(out.map(_._3).toList == List(25.0, 50.0, 75.0, 100.0))
  }

  test("rank-selection boundaries are bitwise equal to Spark's percentile") {
    import spark.implicits._
    // Awkward sizes + duplicates + negative values, several partitionings.
    val base = ((1 to 997).map(i => (i * 37 % 251) - 50.5) ++
      Seq(0.0, 0.0, 0.0, 13.25)).toDF("x")
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    val expect = base
      .agg(percentile(col("x"), array(probs.map(lit): _*)))
      .collect()(0).getSeq[Double](0).toList
    for (parts <- Seq(1, 7, 32)) {
      val got = Quantiles.exactQuantiles(base.repartition(parts), "x", probs)
      assert(got.toList == expect, s"parts=$parts")
    }
  }

  test("exactQuantiles ignores nulls and handles empty input") {
    import spark.implicits._
    val withNulls = Seq[Option[Double]](Some(1.0), None, Some(3.0), None)
      .toDF("x")
    assert(Quantiles.exactQuantiles(withNulls, "x", Seq(0.5)) == Seq(2.0))
    val empty = spark.emptyDataset[Double].toDF("x")
    assert(Quantiles.exactQuantiles(empty, "x", Seq(0.5)).forall(_.isNaN))
  }

  test("a row exactly ON a boundary lands in the lower band (strict >)") {
    import spark.implicits._
    // 5 values → p50 index is integral → boundary == 3.0 exactly.
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    val b = Quantiles.bucketize(df, "x", Seq(0.5), exact = true)
      .as[(Double, Int)].collect().toMap
    assert(b(3.0) == 0 && b(4.0) == 1)
  }

  test("per-group banding uses each group's own boundaries") {
    import spark.implicits._
    // Group a: 1..4 (median 2.5); group b: 100..400 (median 250).
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 100.0), ("b", 200.0), ("b", 300.0), ("b", 400.0)).toDF("g", "x")
    val out = Quantiles.bucketizeByGroup(df, "x", Seq("g"), Seq(0.5), exact = true)
      .as[(String, Double, Int)].collect().toSet
    assert(out == Set(("a", 1.0, 0), ("a", 2.0, 0), ("a", 3.0, 1), ("a", 4.0, 1),
      ("b", 100.0, 0), ("b", 200.0, 0), ("b", 300.0, 1), ("b", 400.0, 1)))
  }

  test("per-group rank selection is bitwise equal to Spark's percentile " +
      "at several partitionings") {
    import spark.implicits._
    // Awkward group sizes (1, 2, big), duplicates, negatives.
    val rows = (1 to 500).map(i => (s"g${i % 7}", (i * 37 % 251) - 50.5)) ++
      Seq(("solo", 42.0), ("pair", -1.0), ("pair", 1.0))
    val probs = Seq(0.25, 0.5, 0.9)
    val base = rows.toDF("g", "x")
    val expect = base.groupBy("g")
      .agg(percentile(col("x"), array(probs.map(lit): _*)).as("qs"))
      .as[(String, Seq[Double])].collect().toMap
    for (parts <- Seq(1, 5, 32)) {
      val got = Quantiles
        .groupBoundsExact(base.repartition(parts), "x", Seq("g"), probs)
        .as[(String, Seq[Double])].collect().toMap
      assert(got == expect, s"parts=$parts")
      // And the banding built on those boundaries keeps every row.
      val banded = Quantiles.bucketizeByGroup(base.repartition(parts),
        "x", Seq("g"), probs, exact = true)
      assert(banded.count() == rows.size.toLong, s"parts=$parts")
    }
  }

  test("exact plans carry no percentile aggregate and no checkpoint " +
      "(the banned value-buffering / partition-id shapes)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "x")
    val grouped = Quantiles.bucketizeByGroup(df, "x", Seq("g"), Seq(0.5),
      exact = true)
    val plan = grouped.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), plan)
    assert(!plan.toLowerCase.contains("checkpoint"), plan)
    assert(!plan.contains("spark_partition_id"), plan)
    // Global exact path: the banding frame is literal boundaries over a
    // scan — equally free of both shapes.
    val global = Quantiles.bucketize(df, "x", Seq(0.5), exact = true)
    val gPlan = global.queryExecution.executedPlan.toString
    assert(!gPlan.contains("percentile(") &&
      !gPlan.toLowerCase.contains("checkpoint") &&
      !gPlan.contains("spark_partition_id"), gPlan)
  }

  test("approx boundaries band all rows and stay near the exact split") {
    import spark.implicits._
    val df = (1 to 10000).map(_.toDouble).toDF("x").repartition(7)
    val out = Quantiles.bucketize(df, "x", Seq(0.25, 0.5, 0.75), exact = false)
      .groupBy("q_bucket").count().as[(Int, Long)].collect().toMap
    assert(out.values.sum == 10000L)
    assert(out.keySet == Set(0, 1, 2, 3))
    out.values.foreach(n => assert(math.abs(n - 2500L) <= 250L))
  }

  test("weighted quantiles: hand-computed inverted CDF with a heavy tail") {
    import spark.implicits._
    // values 1..4 with weights 1,1,1,7 (W=10): cum = 1,2,3,10.
    // p=0.25 -> T=3 -> x=3; p=0.5 -> T=5 -> x=4; p=0.0 -> T=1 -> x=1.
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 7L))
      .toDF("x", "w").repartition(3)
    val got = Quantiles.weightedQuantiles(df, "x", "w", Seq(0.0, 0.25, 0.5))
    assert(got == Seq(1.0, 3.0, 4.0))
  }

  test("weighted quantiles: unit weights reduce to the unweighted " +
      "inverted CDF, and duplicate values merge their weight") {
    import spark.implicits._
    val df = ((1 to 100) ++ (1 to 100)).map(v => (v.toDouble, 1L))
      .toDF("x", "w").repartition(5)
    // 200 unit rows over 100 distinct values: T(p) = ceil(200p) reaches
    // value ceil(T/2) because each value carries merged weight 2.
    val got = Quantiles.weightedQuantiles(df, "x", "w", Seq(0.5, 0.75, 1.0))
    assert(got == Seq(50.0, 75.0, 100.0))
  }

  test("weighted quantiles: zero/negative weights and nulls are inert, " +
      "all-excluded input is NaN") {
    import spark.implicits._
    val df = Seq((Some(1.0), 5L), (Some(2.0), 0L), (Some(9.0), -3L),
      (None, 100L), (Some(3.0), 5L))
      .toDF("x", "w").repartition(2)
    assert(Quantiles.weightedQuantiles(df, "x", "w", Seq(0.5, 1.0))
      == Seq(1.0, 3.0))
    val empty = Seq((Some(1.0), 0L)).toDF("x", "w")
    assert(Quantiles.weightedQuantiles(empty, "x", "w", Seq(0.5))
      .forall(_.isNaN))
  }

  test("weighted quantiles are partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 997).map(i => ((i * 37 % 211).toDouble, (i % 13 + 1).toLong))
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val a = Quantiles.weightedQuantiles(
      rows.toDF("x", "w").repartition(3), "x", "w", probs)
    val b = Quantiles.weightedQuantiles(
      rows.toDF("x", "w").repartition(17), "x", "w", probs)
    assert(a == b)
  }

  test("weighted quantiles validate probs") {
    import spark.implicits._
    val df = Seq((1.0, 1L)).toDF("x", "w")
    intercept[IllegalArgumentException] {
      Quantiles.weightedQuantiles(df, "x", "w", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      Quantiles.weightedQuantiles(df, "x", "w", Nil)
    }
  }
}
