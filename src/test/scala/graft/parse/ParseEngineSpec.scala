package graft.parse

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the config-compiled parse dispatch. The fixture lines
  * are derived from the message formats the reference's patterns declare
  * (`/root/reference/src/config.example.toml:377-538`) — one per pattern
  * family plus the documented edge cases.
  */
class ParseEngineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val fixtures: Seq[(Long, String)] = OsrsFixtures.messages

  private lazy val result: ParseEngine.Result = {
    import spark.implicits._
    val raw = fixtures.toDF("id", "raw_content")
      .selectExpr("id", "timestamp'2024-01-05 12:00:00' as timestamp", "raw_content")
      .select("id", "timestamp", "raw_content")
    ParseEngine.parse(raw)
  }

  private lazy val broadcasts: Map[Long, Seq[Row]] =
    result.broadcasts.collect().toSeq.groupBy(_.getLong(0))

  private def one(id: Long): Row = {
    val rows = broadcasts(id)
    assert(rows.size == 1, s"expected 1 row for id=$id, got ${rows.size}")
    rows.head
  }

  private def field(r: Row, name: String): Any =
    if (r.isNullAt(r.fieldIndex(name))) null else r.get(r.fieldIndex(name))

  test("chat parses first, with optional status icon") {
    val chat = result.chat.collect().sortBy(_.getLong(0))
    assert(chat.length == 2)
    assert(field(chat(0), "Rank") == "Owner")
    assert(field(chat(0), "Username") == "Zezima")
    assert(field(chat(0), "Content") == "gz on the pet")
    assert(field(chat(1), "Status") == "ironman")
    assert(field(chat(1), "Username") == "Iron Hans")
  }

  test("valuable drop variants in declared order") {
    val r3 = one(3)
    assert(field(r3, "Broadcast_Type") == "Valuable Drop")
    assert(field(r3, "Item_Name") == "Abyssal whip")
    assert(field(r3, "Item_Value") == 2500000L)
    assert(field(r3, "Source_Mob") == "Abyssal demon")
    val r4 = one(4) // no source → second variant
    assert(field(r4, "Item_Value") == 2500000L)
    assert(field(r4, "Source_Mob") == null)
    assert(field(one(5), "Broadcast_Type") == "Valuable Drop") // rare drop
    assert(field(one(6), "Item_Name") == "Dragon claws") // item
  }

  test("numeric coercion strips comma grouping") {
    assert(field(one(7), "Item_Value") == 441000000L)
    assert(field(one(14), "New_Level") == 200000000)
    assert(field(one(25), "Item_Value") == 1000000L)
  }

  test("pet variants capture name and killcount") {
    val r10 = one(10)
    assert(field(r10, "Broadcast_Type") == "Pet")
    assert(field(r10, "Pet_Name") == "Hellpuppy")
    assert(field(r10, "Pet_KC") == 1234)
    assert(field(r10, "Pet_KC_Type") == "killcount")
    val r33 = one(33)
    assert(field(r33, "Pet_Name") == "Abyssal orphan")
    assert(field(r33, "Pet_KC") == 542)
  }

  test("level, total level (skill default), xp milestone") {
    assert(field(one(11), "Skill") == "Attack")
    assert(field(one(11), "New_Level") == 99)
    assert(field(one(12), "Skill") == "combat")
    assert(field(one(12), "New_Level") == 126)
    val r13 = one(13)
    assert(field(r13, "Broadcast_Type") == "Total Level")
    assert(field(r13, "Skill") == "Total")
    assert(field(r13, "New_Level") == 2277)
  }

  test("task-shaped broadcasts") {
    assert(field(one(15), "Task_Name") == "Dragon Slayer II")
    val r16 = one(16)
    assert(field(r16, "Tier") == "Elite")
    assert(field(r16, "Task_Name") == "Ardougne")
    val r17 = one(17)
    assert(field(r17, "Tier") == "master")
    assert(field(r17, "Task_Name") == "Perfect Olm")
    val r18 = one(18)
    assert(field(r18, "Task_Name") == "Zulrah")
    assert(field(r18, "PB_Time") == "0:54")
  }

  test("pvp, tiers, clan admin, coffer") {
    val r19 = one(19)
    assert(field(r19, "Broadcast_Type") == "PvP Kill")
    assert(field(r19, "Opponent") == "Evil Bob")
    assert(field(r19, "Item_Value") == 1250000L)
    val r20 = one(20)
    assert(field(r20, "Broadcast_Type") == "PvP Death")
    assert(field(r20, "Item_Value") == 500000L)
    assert(field(one(21), "Tier") == "Grandmaster")
    val r22 = one(22)
    assert(field(r22, "Username") == "Hans")
    assert(field(r22, "Action_By") == "Evil Bob")
    assert(field(one(23), "Broadcast_Type") == "Clan Left")
    assert(field(one(24), "New_Group_Lives") == "2/3")
    assert(field(one(26), "Broadcast_Type") == "Clan Coffer Withdraw")
    assert(field(one(32), "Action_By") == "Evil Bob")
  }

  test("multi-user split explodes one row per user") {
    val rows = broadcasts(27L).map(r => field(r, "Username")).toSet
    assert(rows == Set("Alice", "Bob", "Carol"))
    assert(broadcasts(27L).forall(r => field(r, "Item_Name") == "Dragon hunter lance"))
  }

  test("malformed 'Aand B' username is repaired before splitting") {
    val rows = broadcasts(28L).map(r => field(r, "Username")).toSet
    assert(rows == Set("Alice", "Bob"))
  }

  test("game-mode icon prefixes the broadcast type") {
    val r29 = one(29)
    assert(field(r29, "Broadcast_Type") == "(Leagues) Valuable Drop")
    assert(field(r29, "Item_Value") == 25000L)
  }

  test("bin group order is bug-compatible: shadowed by valuable_drop, " +
      "catches what nothing else does") {
    // "received an item: Infernal cape" is matched by valuable_drop's
    // 4th variant BEFORE the bin group (config declaration order — the
    // reference's own bin rule for it is dead config; we reproduce that).
    assert(field(one(31), "Broadcast_Type") == "Valuable Drop")
    // "one coin" doesn't match the coffer pattern's [\d,]+ — bin takes it.
    assert(field(one(34), "Broadcast_Type") == "Bin")
  }

  test("unmatched rows land in the dead letter with a reason") {
    val un = result.unparsed.collect()
    assert(un.map(_.getLong(0)).toSet == Set(30L))
    assert(un.head.getString(3) == "No matching pattern found")
  }

  test("every fixture routes to exactly one silver table") {
    val chatIds = result.chat.collect().map(_.getLong(0)).toSet
    val bIds = broadcasts.keySet
    val unIds = result.unparsed.collect().map(_.getLong(0)).toSet
    assert(chatIds.intersect(bIds).isEmpty)
    assert((chatIds ++ bIds ++ unIds) == fixtures.map(_._1).toSet)
  }
}
