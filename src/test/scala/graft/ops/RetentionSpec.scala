package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("cohorts count distinct users per (cohort, offset)") {
    import spark.implicits._
    // Weeks are epoch-aligned; 2024-01-01 is a Monday and epoch week
    // boundaries fall on Thursdays — use explicit multi-week gaps instead
    // of calendar intuition.
    val w0 = t("2024-01-05 12:00:00") // some week W
    def plus(days: Int) = new Timestamp(w0.getTime + days * 86400000L)
    val events = Seq(
      // user 1: active W, W+1, W+3 (twice in W — counted once)
      (1L, w0), (1L, plus(1)), (1L, plus(7)), (1L, plus(21)),
      // user 2: active W only
      (2L, plus(1)),
      // user 3: first seen W+1, active W+2
      (3L, plus(7)), (3L, plus(14))
    ).toDF("user_id", "ts")
    val got = Retention.cohorts(events, "user_id", "ts")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val base = got.keys.map(_._1).min
    assert(got == Map(
      (base, 0L) -> 2L,      // users 1, 2
      (base, 1L) -> 1L,      // user 1
      (base, 3L) -> 1L,      // user 1
      (base + 1, 0L) -> 1L,  // user 3's cohort
      (base + 1, 1L) -> 1L))
  }

  test("offset 0 equals the cohort size; counts are partition-invariant") {
    import spark.implicits._
    val events = (0L until 200L).map { i =>
      (i % 40, new Timestamp(1700000000000L + (i % 7) * 86400000L * 7))
    }.toDF("user_id", "ts")
    val a = Retention.cohorts(events, "user_id", "ts")
      .orderBy("cohort_period", "period_offset").collect().toSeq
    val b = Retention.cohorts(events.repartition(13), "user_id", "ts")
      .orderBy("cohort_period", "period_offset").collect().toSeq
    assert(a == b)
    val m = a.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohortSizes = m.collect { case ((c, 0L), n) => c -> n }
    assert(cohortSizes.values.sum == 40L) // every user in exactly one cohort
  }
}
