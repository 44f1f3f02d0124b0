package graft.parse

/** The reference's full pattern inventory (18 broadcast groups, 35
  * variants) re-declared as config data. Regex syntax is Python-`re` in the
  * reference and Java-regex here — these patterns use only the common
  * subset (non-capturing groups, lazy quantifiers, classes), verified by
  * PatternCompilerSpec fixtures, one per variant.
  *
  * Source of truth: `/root/reference/src/config.example.toml:377-538`
  * (patterns are config, not code — they ARE the message-format spec).
  */
object OsrsPatterns {

  private val icon = """(?:<:\w+:\d+>){0,2}\s*"""
  private val coins = """(\d{1,3}(?:,\d{3})*|\d+)"""

  val groups: Seq[GroupDef] = Seq(
    GroupDef("valuable_drop", "Valuable Drop", Seq(
      VariantDef(s"""^$icon(.+?)\\s+received a drop: (.*?)\\s+\\($coins coins\\) from (.*?)\\.?$$""",
        Seq("Username", "Item_Name", "Item_Value", "Source_Mob"),
        Seq("Username", "Item_Name", "Item_Value", "Source_Mob")),
      VariantDef(s"""^$icon(.+?)\\s+received a drop: (.*?)\\s+\\($coins coins\\)\\.?$$""",
        Seq("Username", "Item_Name", "Item_Value"),
        Seq("Username", "Item_Name", "Item_Value")),
      VariantDef("""^(.+?)\s+received a rare drop: (.*)$""",
        Seq("Username", "Item_Name"), Seq("Username", "Item_Name")),
      VariantDef("""^(.+?)\s+received an item: (.*)$""",
        Seq("Username", "Item_Name"), Seq("Username", "Item_Name")))),

    GroupDef("clue_scroll", "Clue Scroll Item", Seq(
      VariantDef(s"""^$icon(.+?)\\s+received a clue item: (.*?)\\s+\\($coins coins\\)\\.?$$""",
        Seq("Username", "Item_Name", "Item_Value"),
        Seq("Username", "Item_Name", "Item_Value")))),

    GroupDef("collection_log", "Collection Log", Seq(
      VariantDef(s"""^$icon(.+?)\\s+received a new collection log item: (.*?)\\s+\\((\\d+/\\d+)\\)$$""",
        Seq("Username", "Item_Name", "Collection_Log_Progress"),
        Seq("Username", "Item_Name", "Collection_Log_Progress")))),

    GroupDef("raid_loot", "Raid Loot", Seq(
      VariantDef(s"""^$icon(.+?)\\s+received special loot from a raid: (.*?)\\.?$$""",
        Seq("Username", "Item_Name"), Seq("Username", "Item_Name")))),

    GroupDef("pet", "Pet", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has a funny feeling.*?:\\s+(.*?)\\s+at\\s+([\\d,]+)\\s+([\\w\\s]+)\\.$$""",
        Seq("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
        Seq("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type")),
      VariantDef(s"""^$icon(.+?)\\s+feels something weird.*?:\\s+(.*?)\\s+at\\s+([\\d,]+)\\s+([\\w\\s]+)\\.$$""",
        Seq("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
        Seq("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type")),
      VariantDef(s"""^$icon(.+?)\\s+has a funny feeling.*?:\\s+(.*?)\\s+at\\s+([\\d,]+)\\s+([\\w\\s]+?)\\s+\\(.*$$""",
        Seq("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
        Seq("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type")),
      VariantDef(s"""^$icon(.+?)\\s+feels like (?:.*?) acquired something special:\\s*(.+)$$""",
        Seq("Username", "Pet_Name"), Seq("Username", "Pet_Name")),
      VariantDef(s"""^$icon(.+?)\\s+has a funny feeling like \\S+ being followed:\\s+(.*?)\\.?$$""",
        Seq("Username", "Pet_Name"), Seq("Username", "Pet_Name")),
      VariantDef(s"""^$icon(.+?)\\s+has a funny feeling like \\S+ would have been followed:\\s+(.*?)\\.?$$""",
        Seq("Username", "Pet_Name"), Seq("Username", "Pet_Name")))),

    GroupDef("level_up", "Level Up", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has reached ([\\w\\s]+) level (\\d+)\\.?$$""",
        Seq("Username", "Skill", "New_Level"), Seq("Username", "Skill", "New_Level")),
      VariantDef(s"""^$icon(.+?)\\s+has reached the highest possible (combat) level of (\\d+)!$$""",
        Seq("Username", "Skill", "New_Level"), Seq("Username", "Skill", "New_Level")))),

    GroupDef("total_level", "Total Level", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has reached a total level of (\\d+)\\.?$$""",
        Seq("Username", "New_Level"), Seq("Username", "New_Level")),
      VariantDef(s"""^$icon(.+?)\\s+has reached the highest possible total level of (\\d+)\\!?$$""",
        Seq("Username", "New_Level"), Seq("Username", "New_Level")))),

    GroupDef("xp_milestone", "XP Milestone", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has reached ([\\d,]+) XP in ([\\w\\s]+)\\.?$$""",
        Seq("Username", "New_Level", "Skill"), Seq("Username", "New_Level", "Skill")))),

    GroupDef("quest", "Quest", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has completed a quest: (.*?)\\.?$$""",
        Seq("Username", "Task_Name"), Seq("Username", "Task_Name")))),

    GroupDef("diary", "Diary", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has completed the (.*?) (.*?) diary\\.$$""",
        Seq("Username", "Tier", "Task_Name"), Seq("Username", "Tier", "Task_Name")))),

    GroupDef("combat_task", "Combat Task", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has completed (?:a|an) (.*?) combat task: (.*?)\\.?$$""",
        Seq("Username", "Tier", "Task_Name"), Seq("Username", "Tier", "Task_Name")))),

    GroupDef("personal_best", "Personal Best", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has achieved a new (.*?) personal best:\\s+([\\d:.]+)$$""",
        Seq("Username", "Task_Name", "PB_Time"), Seq("Username", "Task_Name", "PB_Time")))),

    GroupDef("pvp_kill", "PvP Kill", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has defeated (.*?) and received \\($coins coins\\) worth of loot!(.*)$$""",
        Seq("Username", "Opponent", "Item_Value", "_"), Seq("Username", "Opponent", "Item_Value")),
      VariantDef(s"""^$icon(.+?)\\s+has defeated (.*?), causing (.*?) to lose \\($coins coins\\) worth of loot!(.*)$$""",
        Seq("Username", "Opponent", "_", "Item_Value", "_"), Seq("Username", "Opponent", "Item_Value")))),

    GroupDef("pvp_death", "PvP Death", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has been defeated by (.*?) in The Wilderness and lost \\($coins coins\\) worth of loot(.*)$$""",
        Seq("Username", "Opponent", "Item_Value", "_"), Seq("Username", "Opponent", "Item_Value")),
      VariantDef(s"""^$icon(.+?)\\s+has been defeated by (.*?) in The Wilderness(.*)$$""",
        Seq("Username", "Opponent", "_"), Seq("Username", "Opponent")),
      VariantDef(s"""^$icon(.+?)\\s+has been defeated by (.*?) and lost \\($coins coins\\) worth of loot\\.$$""",
        Seq("Username", "Opponent", "Item_Value"), Seq("Username", "Opponent", "Item_Value")),
      VariantDef(s"""^$icon(.+?)\\s+has been defeated by (.*?) and lost (an extraordinary amount of loot)\\.$$""",
        Seq("Username", "Opponent", "Item_Name"), Seq("Username", "Opponent", "Item_Name")),
      VariantDef(s"""^$icon(.+?)\\s+has been defeated by (.*?)\\.$$""",
        Seq("Username", "Opponent"), Seq("Username", "Opponent")))),

    GroupDef("combat_achievement_tier", "Combat Achievement Tier", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has unlocked the (.*?) tier of rewards from Combat Achievements!$$""",
        Seq("Username", "Tier"), Seq("Username", "Tier")))),

    GroupDef("clan_invite", "Clan Invite", Seq(
      VariantDef(s"""^$icon(.+?)\\s+has been invited into the clan by (.*?)\\.?$$""",
        Seq("Username", "Action_By"), Seq("Username", "Action_By")))),

    GroupDef("clan_expelled", "Clan Expelled", Seq(
      VariantDef("""^(.+?)\s+has expelled (.+?) from the clan\.?$""",
        Seq("Action_By", "Username"), Seq("Action_By", "Username")))),

    GroupDef("clan_left", "Clan Left", Seq(
      VariantDef("""^(.+?)\s+has left the clan\.?$""", Seq("Username"), Seq("Username")))),

    GroupDef("hc_life_lost", "HC Life Lost", Seq(
      VariantDef("""^(.+?)\s+has died and lost a life\. (.*?) group has .*?(\d+/\d+) lives left\.$""",
        Seq("Username", "_", "New_Group_Lives"), Seq("Username", "New_Group_Lives")),
      VariantDef("""^(.+?)\s+has died and lost their Hardcore Ironman status\.$""",
        Seq("Username"), Seq("Username")))),

    GroupDef("clan_coffer_deposit", "Clan Coffer Deposit", Seq(
      VariantDef("""^(.+?)\s+has deposited ([\d,]+) coins into the coffer\.$""",
        Seq("Username", "Item_Value"), Seq("Username", "Item_Value")))),

    GroupDef("clan_coffer_withdraw", "Clan Coffer Withdraw", Seq(
      VariantDef("""^(.+?)\s+has withdrawn ([\d,]+) coins from the coffer\.$""",
        Seq("Username", "Item_Value"), Seq("Username", "Item_Value")))),

    GroupDef("bin", "Bin", Seq(
      VariantDef("""^(.+?)\s+received an item: Infernal cape$""", Seq("Username"), Seq("Username")),
      VariantDef("""^(.+?)\s+has deposited one coin into the coffer\.$""", Seq("Username"), Seq("Username")))))

  val default: ParseConfig = ParseConfig(
    chatRegex = """^<:(\w+):\d+>(?:<:(\w+):\d+>)?\s*\*\*(.*?)\*\*:\s*(.*)""",
    chatColumns = Seq("Rank", "Status", "Username", "Content"),
    chatRequired = Seq.empty,
    groups = groups,
    gameModes = Seq(
      GameModeRule("Leagues", Seq("<:Leagues_IV_badge:123>"))),
    valueOverrides = Seq.empty)
}
