package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.streaming.EmbedUpsertSink._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class EmbedUpsertSinkSpec extends AnyFunSuite with SparkTestBase {

  /** In-memory transport recording every call; ids are sequential. */
  private class FakeChannel extends Transport {
    var nextId = 100L
    val messages = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    val sends = scala.collection.mutable.ArrayBuffer.empty[Long]
    val edits = scala.collection.mutable.ArrayBuffer.empty[Long]
    override def send(content: String): Long = {
      val id = nextId; nextId += 1
      messages(id) = content; sends += id; id
    }
    override def edit(id: Long, content: String): Boolean = {
      edits += id
      if (!messages.contains(id)) false
      else { messages(id) = content; true }
    }
    def delete(id: Long): Unit = messages.remove(id)
  }

  private def summary(rows: (String, String, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("Group", "Task", "Time", "Holder", "Date")
  }

  private val groups = Seq(
    GroupDef("Raids", Seq(RecordDef("Chambers of Xeric", ":cox:"),
      RecordDef("Theatre of Blood"))),
    GroupDef("Bosses", Seq(RecordDef("Zulrah"))))

  private val batch = summary(
    ("Raids", "Chambers of Xeric", "16:30", "alice, bob", "2024-05-01"),
    ("Bosses", "Zulrah", "0:54", "carol", "2024-06-11"),
    ("Miscellaneous PBs", "Barbarian Assault", "9:59", "dave", "2024-01-02"))

  test("first run posts one message per group incl. Miscellaneous; ids recorded") {
    val ch = new FakeChannel
    val st = upsertBatch(batch, groups, "Miscellaneous PBs", Map.empty, ch)
    assert(st.keySet === Set("Raids", "Bosses", "Miscellaneous PBs"))
    assert(ch.sends.size === 3 && ch.edits.isEmpty)
    val raids = ch.messages(st("Raids"))
    assert(raids.contains("# **Raids**"))
    assert(raids.contains(":cox: **Chambers of Xeric**"))
    assert(raids.contains("**Time:** 16:30"))
    assert(raids.contains("**Holder(s):** alice, bob"))
    assert(raids.contains("* *2024-05-01*"))
    // Task defined in config but absent from data → placeholder line.
    assert(raids.contains("⚔️ **Theatre of Blood**"))
    assert(raids.contains("**Time:** 0:00"))
    assert(raids.contains("**Holder(s):** N/A"))
    // Misc group picked up the unclaimed task.
    assert(ch.messages(st("Miscellaneous PBs")).contains("**Barbarian Assault**"))
  }

  test("re-run EDITS the same message ids — no new posts") {
    val ch = new FakeChannel
    val st1 = upsertBatch(batch, groups, "Miscellaneous PBs", Map.empty, ch)
    val sendsAfterFirst = ch.sends.size
    val batch2 = summary(
      ("Raids", "Chambers of Xeric", "15:10", "erin", "2024-07-01"),
      ("Bosses", "Zulrah", "0:54", "carol", "2024-06-11"),
      ("Miscellaneous PBs", "Barbarian Assault", "9:59", "dave", "2024-01-02"))
    val st2 = upsertBatch(batch2, groups, "Miscellaneous PBs", st1, ch)
    assert(st2 === st1, "ids must be stable across runs")
    assert(ch.sends.size === sendsAfterFirst, "re-run must not post")
    assert(ch.messages(st2("Raids")).contains("**Time:** 15:10"))
    assert(ch.messages(st2("Raids")).contains("**Holder(s):** erin"))
  }

  test("deleted message id reposts and the state re-keys to the new id") {
    val ch = new FakeChannel
    val st1 = upsertBatch(batch, groups, "Miscellaneous PBs", Map.empty, ch)
    ch.delete(st1("Bosses"))
    val st2 = upsertBatch(batch, groups, "Miscellaneous PBs", st1, ch)
    assert(st2("Raids") === st1("Raids"))
    assert(st2("Bosses") !== st1("Bosses"), "vanished target must repost")
    assert(ch.messages.contains(st2("Bosses")))
    assert(ch.edits.contains(st1("Bosses")), "must have tried the edit first")
  }

  test("null Time/Date render as the reference placeholders, not 'null'") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("Group", "Task", "Time", "Holder", "Date")
      .map(StructField(_, StringType, nullable = true)))
    val batch = spark.createDataFrame(
      java.util.List.of(Row("Raids", "Chambers of Xeric", null, "alice", null)),
      schema)
    val ch = new FakeChannel
    val st = upsertBatch(batch, Seq(groups.head), "Misc", Map.empty, ch)
    val msg = ch.messages(st("Raids"))
    assert(!msg.contains("null"))
    assert(msg.contains("**Time:** 0:00"))
  }

  test("group with no held records renders the empty-category description") {
    val ch = new FakeChannel
    val empty = summary(("Raids", "Chambers of Xeric", "0:00", "", ""))
    val st = upsertBatch(empty, Seq(groups.head), "Miscellaneous PBs",
      Map.empty, ch)
    assert(ch.messages(st("Raids")) ===
      "# **Raids**\nNo records to display in this category.")
  }

  test("recent-records tail: newest dated records on the Misc embed only") {
    val ch = new FakeChannel
    val b = summary(
      ("Raids", "Chambers of Xeric", "16:30", "alice", "2024-05-01"),
      ("Miscellaneous PBs", "Barbarian Assault", "9:59", "dave", "2024-06-02"),
      ("Miscellaneous PBs", "Fight Caves", "31:00", "erin", "2024-06-03"),
      ("Miscellaneous PBs", "Inferno", "64:00", "frank", "2024-01-01"))
    val st = upsertBatch(b, groups, "Miscellaneous PBs", Map.empty, ch,
      recentCount = 2)
    val misc = ch.messages(st("Miscellaneous PBs"))
    assert(misc.contains("─" * 20))
    assert(misc.contains("## **🏆 Newest Clan Records**"))
    // Newest two by date, descending.
    val iFc = misc.indexOf("* **erin**\n  * *Fight Caves - 31:00*")
    val iBa = misc.indexOf("* **dave**\n  * *Barbarian Assault - 9:59*")
    assert(iFc >= 0 && iBa >= 0 && iFc < iBa)
    assert(!misc.contains("Inferno - 64:00*") ||
      misc.indexOf("*Inferno") < misc.indexOf("🏆"), "3rd-newest excluded from tail")
    // Other groups untouched.
    assert(!ch.messages(st("Raids")).contains("Newest Clan Records"))
  }

  test("recent tail on an empty Misc section uses the placeholder line") {
    val ch = new FakeChannel
    // All dated records live in defined groups; Misc itself is empty.
    val b = summary(
      ("Raids", "Chambers of Xeric", "16:30", "alice", "2024-05-01"))
    val st = upsertBatch(b, groups, "Miscellaneous PBs", Map.empty, ch,
      recentCount = 5)
    val misc = ch.messages(st("Miscellaneous PBs"))
    assert(misc.startsWith("## **Miscellaneous PBs**\n" +
      "*No miscellaneous records to display.*"))
    assert(misc.contains("* **alice**\n  * *Chambers of Xeric - 16:30*"))
  }

  test("combined misc description re-truncates at 4093 + ellipsis") {
    val ch = new FakeChannel
    val rows = (1 to 120).map(i =>
      ("Miscellaneous PBs", "T" * 30 + i, "1:00", "h" * 20 + i,
        f"2024-03-${i % 28 + 1}%02d"))
    val st = upsertBatch(summary(rows: _*), Seq.empty, "Miscellaneous PBs",
      Map.empty, ch, recentCount = 100)
    val misc = ch.messages(st("Miscellaneous PBs"))
    assert(misc.length === 4096)
    assert(misc.endsWith("..."))
  }

  test("embed description truncates at 4096 → 4090 + marker") {
    val many = (1 to 200).map(i => RecordDef("T" * 40 + i))
    val lines = summary((1 to 200).map(i =>
      ("G", "T" * 40 + i, "1:00", "holder" + i, "2024-01-01")): _*)
    val ch = new FakeChannel
    val st = upsertBatch(lines, Seq(GroupDef("G", many)), "Misc", Map.empty, ch)
    val msg = ch.messages(st("G"))
    // Reference semantics exactly: 4090-char prefix + "\n...*truncated*"
    // (the reference's own marker overshoots 4096 by 9 chars — modeled
    // faithfully, not "fixed").
    assert(msg.length === 4090 + "\n...*truncated*".length)
    assert(msg.endsWith("\n...*truncated*"))
  }

  test("webhook summary truncates at 2000 → 1990 + ellipsis") {
    val ch = new FakeChannel
    val id = postSummary(ch, "x" * 2500)
    assert(ch.messages(id).length === 1993)
    assert(ch.messages(id) === "x" * 1990 + "...")
    val ok = postSummary(ch, "short")
    assert(ch.messages(ok) === "short")
  }

  test("state file round-trips (incl. quotes in titles) and corrupt state starts fresh") {
    val p = Files.createTempFile("embed_state", ".json")
    val st = Map("Raids" -> 100L, """The "Misc" Group""" -> 101L)
    saveState(p, st)
    assert(loadState(p) === st)
    Files.write(p, "not json at all".getBytes)
    assert(loadState(p) === Map.empty)
    Files.deleteIfExists(p)
    assert(loadState(p) === Map.empty)
  }

  test("end-to-end streaming: writeStream.foreachBatch upserts per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val p = Files.createTempFile("embed_state3", ".json")
    Files.delete(p)
    val ch = new FakeChannel
    Transports.register("spec-stream", ch)
    val mem = MemoryStream[(String, String, String, String, String)](spark)
    val summary = mem.toDF()
      .toDF("Group", "Task", "Time", "Holder", "Date")
    val q = summary.writeStream
      .foreachBatch(foreachBatchWriter(groups, "Miscellaneous PBs", p,
        "spec-stream"))
      .outputMode("append")
      .start()
    try {
      mem.addData(("Raids", "Chambers of Xeric", "16:30", "alice", "2024-05-01"))
      q.processAllAvailable()
      assert(ch.sends.size === 3) // Raids + Bosses + Misc, batch 0
      val idsAfterFirst = loadState(p)
      mem.addData(("Raids", "Chambers of Xeric", "15:10", "erin", "2024-07-01"))
      q.processAllAvailable()
      // Batch 1 edits the same messages — no new posts, ids stable.
      assert(ch.sends.size === 3)
      assert(loadState(p) === idsAfterFirst)
      assert(ch.messages(idsAfterFirst("Raids")).contains("**Time:** 15:10"))
    } finally q.stop()
    Files.deleteIfExists(p)
  }

  test("foreachBatchWriter persists state so a restarted query keeps editing") {
    val p = Files.createTempFile("embed_state2", ".json")
    Files.delete(p)
    val ch = new FakeChannel
    Transports.register("spec-fake", ch)
    val w = foreachBatchWriter(groups, "Miscellaneous PBs", p, "spec-fake")
    w(batch, 0L)
    val after1 = loadState(p)
    assert(after1.size === 3)
    w(batch, 1L) // second batch: same writer path, state from disk
    assert(loadState(p) === after1)
    assert(ch.sends.size === 3, "batch 2 must edit, not repost")
    Files.deleteIfExists(p)
  }
}
