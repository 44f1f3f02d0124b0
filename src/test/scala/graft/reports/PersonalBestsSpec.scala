package graft.reports

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Asserts the two record-reduction formulations in
  * [[PersonalBests.generate]] — the window form and the single-pass
  * [[graft.expr.PbRecordAgg]] typed aggregate — are bit-identical on a
  * multi-partition fixture (multiple partitions force partial-aggregate
  * serialize/merge on the typed path). One username is >64 KB of UTF-8 to
  * pin the length-prefixed string codec (writeUTF would throw there).
  */
class PersonalBestsSpec extends AnyFunSuite with SparkTestBase {

  private val longUser = "long_" + ("x" * 70000)

  private def fixture(n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to n).map { i =>
      val task = s"Task_${i % 7}"
      // Mixed casing exercises canonicalization on both paths.
      val taskCase = if (i % 2 == 0) task else task.toLowerCase
      val user = if (i == 37) longUser else s"user_${i % 11}"
      val cents = 100 + rnd.nextInt(500)
      val time = f"${cents / 6000}%d:${(cents % 6000) / 100}%02d.${cents % 100}%02d"
      (i.toLong, Timestamp.valueOf(f"2024-01-${1 + i % 28}%02d 10:${i % 60}%02d:00"),
        "Personal Best", user, taskCase, time)
    }
    rows.toDF("raw_log_id", "Timestamp", "Broadcast_Type", "Username", "Task_Name", "PB_Time")
      .repartition(5)
  }

  private val hist = PbHistoricalData(
    records = Seq(
      HistoricalPbRecord("G1", "Task_1", "0:00", Seq("Alice", "Bob"), None),
      HistoricalPbRecord("G1", "Task_99", "1:30.00", Seq("Carol"), Some("2023-05-01")),
      HistoricalPbRecord("G2", "Task_2", "0:01.00", Seq("Dave", longUser), None),
      HistoricalPbRecord("G2", "Task_77", "2:00.00", Seq("Eve"), Some("2023-06-01"))),
    blacklist = Seq(
      PbBlacklistRule("Eve", None, None),
      PbBlacklistRule("user_3", Some("Task_4"), None),
      PbBlacklistRule("user_5", Some("Task_5"), Some("0:04.00"))),
    excludeRules = Seq(Seq("Task_6")),
    otherGroupName = "Misc PBs")

  private def run(pbDef: PersonalBestsDef): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    val bc = fixture(400)
    val window = PersonalBests.generate(bc, pbDef, hist, singlePass = false)
      .orderBy("Task").collect().toSeq
    val single = PersonalBests.generate(bc, pbDef, hist, singlePass = true)
      .orderBy("Task").collect().toSeq
    (window, single)
  }

  test("singlePass is bit-identical to the window form (multi holders)") {
    val (w, s) = run(PersonalBestsDef(
      similarityThresholdSeconds = 0.6, groupingWindowSeconds = 3600,
      allowMultipleHolders = true))
    assert(s === w)
    assert(w.nonEmpty)
  }

  test("singlePass is bit-identical to the window form (single holder, tight window)") {
    val (w, s) = run(PersonalBestsDef(
      similarityThresholdSeconds = 0.0, groupingWindowSeconds = 1,
      allowMultipleHolders = false))
    assert(s === w)
  }

  test("oversized holder strings survive the typed-aggregate shuffle") {
    val (_, s) = run(PersonalBestsDef(
      similarityThresholdSeconds = 5.0, groupingWindowSeconds = 86400 * 365,
      allowMultipleHolders = true))
    // The >64 KB username must round-trip intact through serialize/merge.
    assert(s.exists(_.getString(1).contains(longUser)) ||
      s.exists(_.getString(1).contains("long_x")))
  }
}
