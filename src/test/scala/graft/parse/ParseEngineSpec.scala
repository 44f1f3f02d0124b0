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

  private lazy val fixtures: Seq[(Long, String)] = Seq(
    1L -> "<:Owner:123>**Zezima**: gz on the pet",
    2L -> "<:Owner:123><:ironman:456>**Iron Hans**: 111",
    3L -> "<:icon:1> Hans received a drop: Abyssal whip (2,500,000 coins) from Abyssal demon.",
    4L -> "Hans received a drop: Abyssal whip (2,500,000 coins)",
    5L -> "Hans received a rare drop: Twisted bow",
    6L -> "Hans received an item: Dragon claws",
    7L -> "Hans received a clue item: 3rd age cloak (441,000,000 coins)",
    8L -> "Hans received a new collection log item: Hellpuppy (123/1577)",
    9L -> "Hans received special loot from a raid: Dexterous prayer scroll.",
    10L -> "Hans has a funny feeling like he's being followed: Hellpuppy at 1,234 killcount.",
    11L -> "Hans has reached Attack level 99.",
    12L -> "Hans has reached the highest possible combat level of 126!",
    13L -> "Hans has reached a total level of 2277.",
    14L -> "Hans has reached 200,000,000 XP in Fishing.",
    15L -> "Hans has completed a quest: Dragon Slayer II.",
    16L -> "Hans has completed the Elite Ardougne diary.",
    17L -> "Hans has completed a master combat task: Perfect Olm.",
    18L -> "Hans has achieved a new Zulrah personal best: 0:54",
    19L -> "Hans has defeated Evil Bob and received (1,250,000 coins) worth of loot!",
    20L -> "Hans has been defeated by Evil Bob in The Wilderness and lost (500,000 coins) worth of loot.",
    21L -> "Hans has unlocked the Grandmaster tier of rewards from Combat Achievements!",
    22L -> "Evil Bob has expelled Hans from the clan.",
    23L -> "Hans has left the clan.",
    24L -> "Hans has died and lost a life. Their group has 2/3 lives left.",
    25L -> "Hans has deposited 1,000,000 coins into the coffer.",
    26L -> "Hans has withdrawn 2,000,000 coins from the coffer.",
    27L -> "Alice, Bob and Carol received special loot from a raid: Dragon hunter lance.",
    28L -> "Aliceand Bob received special loot from a raid: Dragon hunter lance.",
    29L -> "<:Leagues_IV_badge:123> Hans received a drop: Rune scimitar (25,000 coins) from Zombie.",
    30L -> "some random bot message",
    31L -> "Hans received an item: Infernal cape",
    32L -> "Hans has been invited into the clan by Evil Bob.",
    33L -> "Hans feels something weird sneaking into her backpack: Abyssal orphan at 542 killcount.",
    34L -> "Hans has deposited one coin into the coffer.")

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
