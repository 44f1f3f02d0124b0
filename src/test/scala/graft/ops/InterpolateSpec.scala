package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Date

/** [[TimeSeries.interpolateLinear]]: hand-checked fills, and bit-identity
  * between the chunked formulation and the global (single-chunk) form —
  * including chunks that contain no observations at all.
  */
class InterpolateSpec extends AnyFunSuite with SparkTestBase {

  private def obs(rows: (String, Double)*) = {
    import spark.implicits._
    rows.map { case (d, v) => (Date.valueOf(d), v) }.toSeq.toDF("d", "v")
  }

  test("hand-checked linear fill over the date spine") {
    import spark.implicits._
    val out = TimeSeries.interpolateLinear(
      obs("2024-01-01" -> 1.0, "2024-01-04" -> 4.0, "2024-01-06" -> 2.0),
      "d", "v", TimeSeries.weekChunk(col("d")))
      .as[(Date, Double, Int)].collect().sortBy(_._1.toString)
    assert(out.map(_._1.toString).toList == (1 to 6).map(i => f"2024-01-0$i").toList)
    assert(out.map(_._2).toList == List(1.0, 2.0, 3.0, 4.0, 3.0, 2.0))
    assert(out.map(_._3).toList == List(0, 1, 1, 0, 1, 0))
  }

  test("chunked carry is bit-identical to the global form, incl. empty chunks") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // ~5 months of days, keeping ~1 in 6 → many week-chunks with zero
    // observations (carry must hop over them).
    val base = java.time.LocalDate.of(2023, 11, 15)
    val rows = (0 until 150).filter(_ => rng.nextInt(6) == 0).map { i =>
      (Date.valueOf(base.plusDays(i.toLong)), rng.nextDouble() * 100)
    }
    assert(rows.length > 10)
    val series = rows.toDF("d", "v")

    val chunked = TimeSeries.interpolateLinear(series, "d", "v",
      TimeSeries.weekChunk(col("d")))
    val global = TimeSeries.interpolateLinear(series, "d", "v", lit(0))

    val a = chunked.orderBy("d").as[(Date, Double, Int)].collect().toSeq
    val b = global.orderBy("d").as[(Date, Double, Int)].collect().toSeq
    assert(a == b) // exact double equality — carries copy, never recompute
    assert(a.length == 150 || a.length == rows.last._1.toLocalDate.toEpochDay
      - rows.head._1.toLocalDate.toEpochDay + 1)
  }

  test("monotone week chunk differs across ISO-year wrap where weekofyear repeats") {
    import spark.implicits._
    val d1 = Seq(Date.valueOf("2023-01-02"), Date.valueOf("2024-01-01"))
      .toDF("d").select(TimeSeries.weekChunk(col("d")).as("c"))
      .as[Long].collect()
    assert(d1(0) != d1(1)) // weekofyear would give 1 for both
  }
}
