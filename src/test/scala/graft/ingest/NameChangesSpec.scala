package graft.ingest

import java.sql.Timestamp

import graft.SparkTestBase
import graft.enrich.Enrichment
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class NameChangesSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def msgs(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, title, desc) => (id, ts(t), title, desc) }
      .toDF("message_id", "created_at", "embed_title", "embed_description")
  }

  test("parse: arrow extraction, trim, title filter, non-matching dropped") {
    val m = msgs(Seq(
      (1L, "2024-01-01 10:00:00", "Member Name Changed", "alpha → beta"),
      (2L, "2024-01-02 10:00:00", "Member Name Changed", "  gamma  →  delta gamma  "),
      (3L, "2024-01-03 10:00:00", "Member Name Changed", "no arrow here"),
      (4L, "2024-01-04 10:00:00", "Other Embed", "x → y"),
      (5L, "2024-01-05 10:00:00", "Member Name Changed", null)))
    val parsed = NameChanges.parse(m).orderBy("discord_message_id").collect()
    assert(parsed.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(parsed.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("alpha", "beta"), ("gamma", "delta gamma")))
  }

  test("watermark resume: exclusive cursor + idempotent append under overlap") {
    import spark.implicits._
    val batch1 = msgs(Seq(
      (10L, "2024-01-01 10:00:00", "Member Name Changed", "a → b"),
      (11L, "2024-01-02 10:00:00", "noise", "n/a"),
      (12L, "2024-01-03 10:00:00", "Member Name Changed", "c → d")))

    val empty = NameChanges.parse(msgs(Nil))
    val stored1 = empty.unionByName(
      NameChanges.rowsToAppend(empty, NameChanges.parse(batch1)))
    assert(stored1.count() == 2)

    // Watermark advances to the max SCANNED id (12, a non-matching row
    // would also count), and the cursor is exclusive on resume.
    val wm1 = NameChanges.nextWatermark(batch1, None)
    assert(wm1.contains(12L))

    // Batch 2 overlaps (stale cursor 10): re-scan of 11/12 plus new 13.
    val batch2 = msgs(Seq(
      (12L, "2024-01-03 10:00:00", "Member Name Changed", "c → d"),
      (13L, "2024-01-04 10:00:00", "Member Name Changed", "e → f")))
    val scanned2 = NameChanges.afterWatermark(batch2, Some(10L))
    val toAppend = NameChanges.rowsToAppend(stored1, NameChanges.parse(scanned2))
    assert(toAppend.collect().map(_.getLong(0)).toSeq == Seq(13L))

    val stored2 = stored1.unionByName(toAppend)
    assert(stored2.count() == 3)
    // Re-running the same batch appends nothing (idempotent).
    assert(NameChanges.rowsToAppend(stored2, NameChanges.parse(scanned2)).count() == 0)
    // Watermark never regresses.
    assert(NameChanges.nextWatermark(msgs(Nil), Some(13L)).contains(13L))

    // sync_metadata upsert: insert then overwrite.
    val meta0 = Seq(("other_key", "x")).toDF("key", "value")
    val meta1 = NameChanges.upsertMetadata(meta0, "last_message_id", "12")
    val meta2 = NameChanges.upsertMetadata(meta1, "last_message_id", "13")
    val kv = meta2.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv == Map("other_key" -> "x", "last_message_id" -> "13"))
  }

  test("toMappingRules: chained renames compose through applyUsernameMapping") {
    import spark.implicits._
    val changes = NameChanges.parse(msgs(Seq(
      (1L, "2024-01-01 10:00:00", "Member Name Changed", "alpha → beta"),
      (2L, "2024-02-01 10:00:00", "Member Name Changed", "beta → gamma"))))
    val rules = NameChanges.toMappingRules(changes)
    assert(rules.map(_.targetUsername) == Seq("gamma", "beta")) // newest first

    val events = Seq(
      ("alpha", ts("2023-12-01 00:00:00")), // pre-rename history → gamma
      ("beta", ts("2024-01-15 00:00:00")), // mid-chain → gamma
      ("other", ts("2024-01-20 00:00:00"))) // untouched
      .toDF("Username", "Timestamp")
    val out = Enrichment.applyUsernameMapping(events, rules)
      .orderBy("Timestamp").collect().map(_.getString(0)).toSeq
    assert(out == Seq("gamma", "gamma", "other"))
  }
}
