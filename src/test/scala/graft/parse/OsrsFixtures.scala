package graft.parse

/** Shared message corpus: one representative per broadcast family plus the
  * documented edge cases — used by the parse-engine spec and any test that
  * needs realistic coverage of every dispatch variant.
  */
object OsrsFixtures {
  val messages: Seq[(Long, String)] = Seq(
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
}
