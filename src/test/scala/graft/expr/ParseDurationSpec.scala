package graft.expr

import graft.SparkTestBase
import graft.expr.ParseDuration.parseDuration
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ParseDurationSpec extends AnyFunSuite with SparkTestBase {

  private def viaSpark(inputs: Seq[String]): Seq[Double] = {
    import spark.implicits._
    inputs.toDF("s").select(parseDuration(col("s"))).collect().map(_.getDouble(0)).toSeq
  }

  test("reference fixtures: H:M:S, M:S, S, fractions, malformed, sentinel") {
    val cases = Seq(
      "1:15:45" -> 4545.0,
      "1:23.4" -> 83.4,
      "0:54" -> 54.0,
      "54" -> 54.0,
      "54.5" -> 54.5,
      "1:23.40" -> 83.4,
      "0:00" -> 0.0,
      "" -> Double.PositiveInfinity,
      "abc" -> Double.PositiveInfinity,
      "1:xx" -> Double.PositiveInfinity,
      "1:2:3:4" -> 0.0) // >3 parts falls through to the initialized 0
    val got = viaSpark(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), actual) =>
      assert(actual == want, s"parse('$in')")
    }
  }

  test("null input yields the +inf sentinel, never null") {
    import spark.implicits._
    val got = Seq[Option[String]](None).toDF("s")
      .select(parseDuration(col("s"))).collect()
    assert(got.head.getDouble(0) == Double.PositiveInfinity)
  }

  test("round-trip property: format(h, m, s) parses back exactly") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val (h, m, s, f) =
        (rng.nextInt(31), rng.nextInt(60), rng.nextInt(60), rng.nextInt(10))
      val str = f"$h:$m%02d:$s%02d.$f"
      val expected = h * 3600 + m * 60 + s + f / 10.0
      val got = ParseDuration.parse(
        org.apache.spark.unsafe.types.UTF8String.fromString(str))
      assert(math.abs(got - expected) < 1e-9, str)
    }
  }

  test("interpreted eval and codegen agree") {
    import spark.implicits._
    val inputs = Seq("1:15:45", "0:54", "bad", "1:2:3:4", "59.9")
    // Filter with a constant-true predicate built from the expression to
    // force both codegen'd projection and interpreted paths.
    val df = inputs.toDF("s")
    val viaProjection = df.select(parseDuration(col("s")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    val direct = inputs.map(s => ParseDuration.parse(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(viaProjection == direct)
  }
}
