package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Date

/** [[TimeSeries.trailingWindow]]: the scatter-and-regroup moving window
  * must match the ordered `ROWS w-1 PRECEDING` window it replaces,
  * exactly (decimal values), including the truncated start.
  */
class TrailingWindowSpec extends AnyFunSuite with SparkTestBase {

  test("matches the ordered-window moving sum/count on a gap-free series") {
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 3, 1)
    val rows = (0 until 60).map { i =>
      (Date.valueOf(base.plusDays(i.toLong)), BigDecimal(i * 37 % 100, 2))
    }
    val daily = rows.toDF("d", "v")
      .withColumn("v", col("v").cast("decimal(18,4)"))

    val fast = TimeSeries.trailingWindow(daily, "d", "v", 7)
      .select(col("d"), col("w_sum").cast("decimal(18,4)").as("w_sum"), col("w_days"))

    val w = Window.orderBy("d").rowsBetween(-6, 0)
    val slow = daily
      .withColumn("w_sum", sum(col("v")).over(w).cast("decimal(18,4)"))
      .withColumn("w_days", count(lit(1)).over(w))
      .select("d", "w_sum", "w_days")

    val a = fast.orderBy("d").collect().toSeq
    val b = slow.orderBy("d").collect().toSeq
    assert(a == b)
  }

  test("window truncates at the start and emits nothing past the series end") {
    import spark.implicits._
    val daily = Seq(
      (Date.valueOf("2024-01-01"), BigDecimal(1)),
      (Date.valueOf("2024-01-02"), BigDecimal(2)),
      (Date.valueOf("2024-01-03"), BigDecimal(3))).toDF("d", "v")
    val out = TimeSeries.trailingWindow(daily, "d", "v", 3)
      .orderBy("d")
      .select(col("d").cast("string"), col("w_days"))
      .as[(String, Long)].collect().toList
    assert(out == List(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L)))
  }
}
