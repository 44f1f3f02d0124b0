package graft.queries

import graft.Tables
import graft.expr.ParseDuration.parseDuration
import graft.parse.PatternCompiler
import graft.reports.CollectionLog
import org.apache.spark.sql.functions._

/** The parse-engine mechanisms (SURVEY.md §2.2) exercised against the
  * driver fixtures with DuckDB oracles: messages are SYNTHESIZED
  * deterministically from `events`/`part` rows inside the query, then
  * parsed back — both engines build and parse the same strings, so the
  * regex dispatch, numeric coercion, multi-user split, duration parse,
  * quantity parse, escape cleanup, and JSON extraction are all
  * hash-checked end-to-end.
  */
object ParseQueries extends QueryGroup {

  // Deterministic OSRS-shaped message per event row (comma-grouped value
  // exercises the numeric coercion path).
  private def message = {
    // round() before the long cast: Spark's double→long cast truncates but
    // DuckDB's rounds, and value*1000 lands within 1 ulp of an integer.
    val coins = format_number(round(col("value") * 1000, 0).cast("long"), 0)
    when(col("event_type") === "purchase",
      format_string("user_%d received a drop: Item_%d (%s coins) from Mob_%d.",
        col("user_id"), pmod(col("event_id"), lit(50)), coins, pmod(col("event_id"), lit(7))))
      .when(col("event_type") === "click",
        format_string("user_%d has reached Attack level %d.",
          col("user_id"), pmod(col("event_id"), lit(99)) + 1))
      .when(col("event_type") === "signup",
        format_string("user_%d has been invited into the clan by user_%d.",
          col("user_id"), pmod(col("event_id"), lit(15))))
      .otherwise(format_string("noise event %d", col("event_id")))
  }

  val queries: Map[String, Q] = Map(
    // P1/P2/P4/P5: the compiled first-match-wins dispatch + coercion.
    "q_parse_dispatch" -> ((s, dir) => {
      val withMsg = Tables.events(s, dir).withColumn("__msg", message)
      val b = PatternCompiler.broadcastStruct(col("__msg"), graft.parse.OsrsPatterns.default)
      withMsg
        .withColumn("__b", b)
        .select(col("event_id"),
          col("__b.Broadcast_Type").as("broadcast_type"),
          col("__b.Username").as("username"),
          col("__b.Item_Name").as("item_name"),
          col("__b.Item_Value").as("item_value"),
          col("__b.New_Level").as("new_level"),
          col("__b").isNotNull.cast("int").as("parsed"))
    }),

    // P10: multi-user split incl. the malformed-"and" repair.
    "q_parse_multiuser" -> ((s, dir) => {
      val username = when(pmod(col("user_id"), lit(3)) === 0,
        format_string("user_%d, user_%d and user_%d",
          col("user_id"), col("user_id") + 100, col("user_id") + 200))
        .when(pmod(col("user_id"), lit(3)) === 1,
          format_string("user_%dand user_%d", col("user_id"), col("user_id") + 100))
        .otherwise(format_string("user_%d", col("user_id")))
      Tables.events(s, dir)
        .withColumn("__u", username)
        .select(col("event_id"),
          explode(PatternCompiler.usernameList(col("__u"))).as("username"))
    }),

    // P12: duration round-trip through the custom ParseDuration expression.
    // Built from integer cents so both engines format the identical string
    // (float printf rounds differently across libc and the JVM).
    "q_parse_duration" -> ((s, dir) => {
      val cents = round(col("value") * 100, 0).cast("long")
      val str = format_string("%d:%02d.%02d",
        (cents / 6000L).cast("long"),
        (pmod(cents, lit(6000L)) / 100L).cast("long"),
        pmod(cents, lit(100L)))
      Tables.events(s, dir)
        .withColumn("__dur", str)
        .select(col("event_id"), col("__dur").as("dur"),
          round(parseDuration(col("__dur")), 4).as("seconds"))
    }),

    // P13: "N x Item" quantity parse over part names.
    "q_parse_quantity" -> ((s, dir) => {
      val itemStr = when(pmod(col("p_partkey"), lit(2)) === 0,
        format_string("%d x %s", col("p_size"), col("p_name")))
        .otherwise(col("p_name"))
      val (name, qty) = CollectionLog.parseQuantity(col("__item"))
      Tables.part(s, dir)
        .withColumn("__item", itemStr)
        .select(col("p_partkey"), name.as("item_name"), qty.as("quantity"))
    }),

    // P11: Discord escape cleanup.
    "q_parse_escapes" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("__esc", concat(lit("\\("), col("source"), lit("\\) \\*x\\*")))
        .select(col("doc_id"),
          PatternCompiler.cleanEscapes(col("__esc")).as("cleaned"))
    }),

    // Scalar JSON extraction (events.props payload).
    "q_parse_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
    }),

    // P15: period labels (month name, ISO week) used by dashboard_config.
    "q_parse_date_labels" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          date_format(col("ts"), "MMMM yyyy").as("month_label"),
          weekofyear(col("ts")).cast("int").as("iso_week"))
    }),

    // P7/P9: game-mode prefixing + total-level skill default through the
    // REAL ParseEngine — a Leagues badge prefixes the final type, the
    // skill defaults to 'Total' only for the UNPREFIXED 'Total Level'
    // type (bug-compatible: '(Leagues) Total Level' keeps a null skill).
    "q_parse_modes" -> ((s, dir) => {
      val badge = "<:Leagues_IV_badge:123> "
      val msg =
        when(col("event_type") === "purchase",
          format_string("user_%d has reached Fishing level %d.",
            col("user_id"), pmod(col("event_id"), lit(99)) + 1))
          .when(col("event_type") === "click" && pmod(col("event_id"), lit(2)) === 0,
            format_string("user_%d has reached a total level of %d.",
              col("user_id"), pmod(col("event_id"), lit(1777)) + 500))
          .when(col("event_type") === "click",
            format_string(badge + "user_%d has reached a total level of %d.",
              col("user_id"), pmod(col("event_id"), lit(1777)) + 500))
          .when(col("event_type") === "signup",
            format_string(badge + "user_%d has reached Attack level %d.",
              col("user_id"), pmod(col("event_id"), lit(99)) + 1))
          .otherwise(format_string("noise event %d", col("event_id")))
      val raw = Tables.events(s, dir)
        .select(col("event_id").as("id"), col("ts").as("timestamp"),
          msg.as("raw_content"))
      graft.parse.ParseEngine.parse(raw).broadcasts
        .select(col("raw_log_id"), col("Broadcast_Type").as("broadcast_type"),
          col("Username").as("username"), col("Skill").as("skill"),
          col("New_Level").as("new_level"))
    }),

    // P1/P3/P5: the chat branch of the parse engine
    // (2_parse_engine.py:142-156, pattern config.example.toml:381-384),
    // tried BEFORE every broadcast pattern. Four fixtures per event row:
    // a plain chat line (escape cleanup inside the content), a chat line
    // with the optional status icon and BLANK content (regex-matches,
    // blank→null coercion), a chat line whose CONTENT is a valuable-drop
    // broadcast (must land in chat, never broadcasts — the precedence
    // row), and a pure broadcast (must land in broadcasts). Emitting the
    // union of both silver tables puts the precedence itself under the
    // hash gate: a dispatch that let broadcasts win would emit the drop
    // row twice with different shapes.
    "q_parse_chat" -> ((s, dir) => {
      val msg =
        when(col("event_type") === "purchase",
          format_string("<:rank_%d:100>**user_%d**: dropped \\*%d\\* coins",
            pmod(col("event_id"), lit(5)), col("user_id"), col("event_id")))
          .when(col("event_type") === "click",
            format_string("<:rank_%d:100><:status_on:9>  **user_%d**:   ",
              pmod(col("event_id"), lit(5)), col("user_id")))
          .when(col("event_type") === "signup",
            format_string("<:rank_%d:100>**user_%d**: received a drop: Item_%d (500 coins) from Mob_1.",
              pmod(col("event_id"), lit(5)), col("user_id"), pmod(col("event_id"), lit(50))))
          .otherwise(format_string("user_%d has reached Attack level %d.",
            col("user_id"), pmod(col("event_id"), lit(99)) + 1))
      val raw = Tables.events(s, dir)
        .select(col("event_id").as("id"), col("ts").as("timestamp"),
          msg.as("raw_content"))
      val r = graft.parse.ParseEngine.parse(raw)
      r.chat.select(col("raw_log_id"), lit("chat").as("message_type"),
          col("Rank").as("rank"), col("Status").as("status"),
          col("Username").as("username"), col("Content").as("info"))
        .unionByName(r.broadcasts.select(col("raw_log_id"),
          lit("broadcast").as("message_type"),
          lit(null).cast("string").as("rank"),
          lit(null).cast("string").as("status"),
          col("Username").as("username"),
          col("Broadcast_Type").as("info")))
    }),

    // END-TO-END: the real OSRS pipeline against the oracle — synthesized
    // raw messages → ParseEngine (full 35-variant dispatch) → the actual
    // period-pivoted leaderboard report generator. This puts the report
    // engine itself (not just its building blocks) under the hash gate.
    "q_osrs_leaderboard_e2e" -> ((s, dir) => {
      import java.sql.Timestamp
      val raw = Tables.events(s, dir)
        .withColumn("__msg", message)
        .select(col("event_id").as("id"), col("ts").as("timestamp"),
          col("__msg").as("raw_content"))
      val parsed = graft.parse.ParseEngine.parse(raw)
      val periods = Seq(
        graft.reports.Period("All_Time", None,
          Timestamp.valueOf("2024-02-01 00:00:00"), "All-Time"),
        graft.reports.Period("JanH1",
          Some(Timestamp.valueOf("2024-01-01 00:00:00")),
          Timestamp.valueOf("2024-01-15 00:00:00"), "Jan H1"),
        graft.reports.Period("JanH2",
          Some(Timestamp.valueOf("2024-01-15 00:00:00")),
          Timestamp.valueOf("2024-02-01 00:00:00"), "Jan H2"))
      graft.reports.Reports.leaderboard(
        parsed.chat, parsed.broadcasts,
        graft.reports.LeaderboardReportDef("e2e",
          broadcastTypes = Seq("Valuable Drop"),
          groupByColumn = "Username",
          countColumn = Some("Username"),
          valueColumn = Some("Item_Value")),
        periods)
        .select(col("Username").as("username"),
          col("Count_All_Time").as("count_all_time"),
          col("Value_All_Time").as("value_all_time"),
          col("Count_JanH1").as("count_jan_h1"),
          col("Value_JanH1").as("value_jan_h1"),
          col("Count_JanH2").as("count_jan_h2"),
          col("Value_JanH2").as("value_jan_h2"))
    }))

  private val coinsSql = "format('{:,}', CAST(round(value * 1000, 0) AS BIGINT))"
  private val messageSql =
    s"""CASE event_type
       |  WHEN 'purchase' THEN printf('user_%d received a drop: Item_%d (%s coins) from Mob_%d.',
       |    user_id, event_id % 50, $coinsSql, event_id % 7)
       |  WHEN 'click' THEN printf('user_%d has reached Attack level %d.',
       |    user_id, event_id % 99 + 1)
       |  WHEN 'signup' THEN printf('user_%d has been invited into the clan by user_%d.',
       |    user_id, event_id % 15)
       |  ELSE printf('noise event %d', event_id) END""".stripMargin

  // Mirrors OsrsPatterns: drop variant 1, level variant 1, clan invite.
  private val dropPat =
    """^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+received a drop: (.*?)\s+\((\d{1,3}(?:,\d{3})*|\d+) coins\) from (.*?)\.?$"""
  private val levelPat = """^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached ([\w\s]+) level (\d+)\.?$"""
  private val invitePat = """^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has been invited into the clan by (.*?)\.?$"""
  // Mirrors OsrsPatterns.default.chatRegex (config.example.toml:381-384).
  private val chatPat = """^<:(\w+):\d+>(?:<:(\w+):\d+>)?\s*\*\*(.*?)\*\*:\s*(.*)"""

  val oracles: Map[String, String] = Map(
    "q_parse_dispatch" ->
      s"""WITH m AS (SELECT event_id, $messageSql AS msg FROM events)
         |SELECT event_id,
         |  CASE WHEN regexp_matches(msg, '$dropPat') THEN 'Valuable Drop'
         |       WHEN regexp_matches(msg, '$levelPat') THEN 'Level Up'
         |       WHEN regexp_matches(msg, '$invitePat') THEN 'Clan Invite'
         |  END AS broadcast_type,
         |  CASE WHEN regexp_matches(msg, '$dropPat') THEN trim(regexp_extract(msg, '$dropPat', 1))
         |       WHEN regexp_matches(msg, '$levelPat') THEN trim(regexp_extract(msg, '$levelPat', 1))
         |       WHEN regexp_matches(msg, '$invitePat') THEN trim(regexp_extract(msg, '$invitePat', 1))
         |  END AS username,
         |  CASE WHEN regexp_matches(msg, '$dropPat') THEN trim(regexp_extract(msg, '$dropPat', 2))
         |  END AS item_name,
         |  CASE WHEN regexp_matches(msg, '$dropPat')
         |       THEN CAST(replace(regexp_extract(msg, '$dropPat', 3), ',', '') AS BIGINT)
         |  END AS item_value,
         |  CASE WHEN regexp_matches(msg, '$levelPat')
         |       THEN CAST(regexp_extract(msg, '$levelPat', 3) AS INT)
         |  END AS new_level,
         |  CAST(regexp_matches(msg, '$dropPat') OR regexp_matches(msg, '$levelPat')
         |    OR regexp_matches(msg, '$invitePat') AS INT) AS parsed
         |FROM m""".stripMargin,
    "q_parse_multiuser" ->
      """WITH u AS (
        |  SELECT event_id,
        |    CASE user_id % 3
        |      WHEN 0 THEN printf('user_%d, user_%d and user_%d', user_id, user_id + 100, user_id + 200)
        |      WHEN 1 THEN printf('user_%dand user_%d', user_id, user_id + 100)
        |      ELSE printf('user_%d', user_id) END AS name
        |  FROM events),
        |rep AS (
        |  SELECT event_id, name,
        |    array_to_string(list_transform(string_split(name, ' '),
        |      w -> CASE WHEN lower(w) LIKE '%and' AND len(w) > 3
        |        THEN substr(w, 1, len(w) - 3) || ' and' ELSE w END), ' ') AS fixed
        |  FROM u),
        |split_out AS (
        |  SELECT event_id,
        |    CASE WHEN contains(fixed, ',') OR contains(fixed, ' and ')
        |      THEN list_filter(list_transform(
        |        string_split(replace(fixed, ',', ' and '), ' and '), x -> trim(x)),
        |        x -> x <> '')
        |      ELSE [name] END AS users
        |  FROM rep)
        |SELECT event_id, unnest(users) AS username FROM split_out""".stripMargin,
    "q_parse_duration" ->
      """WITH d AS (
        |  SELECT event_id,
        |    printf('%d:%02d.%02d', c // 6000, (c % 6000) // 100, c % 100) AS dur
        |  FROM (SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS c FROM events))
        |SELECT event_id, dur,
        |  round(CAST(string_split(dur, ':')[1] AS BIGINT) * 60
        |    + CAST(string_split(dur, ':')[2] AS DOUBLE), 4) AS seconds
        |FROM d""".stripMargin,
    "q_parse_quantity" ->
      """WITH i AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 2 = 0 THEN printf('%d x %s', p_size, p_name)
        |         ELSE p_name END AS item
        |  FROM part)
        |SELECT p_partkey,
        |  CASE WHEN regexp_matches(trim(item), '^([\d,]+)\s*x\s*(.+)')
        |    THEN trim(regexp_extract(trim(item), '^([\d,]+)\s*x\s*(.+)', 2))
        |    ELSE trim(item) END AS item_name,
        |  CASE WHEN regexp_matches(trim(item), '^([\d,]+)\s*x\s*(.+)')
        |    THEN CAST(replace(regexp_extract(trim(item), '^([\d,]+)\s*x\s*(.+)', 1), ',', '') AS BIGINT)
        |    ELSE 1 END AS quantity
        |FROM i""".stripMargin,
    "q_parse_escapes" ->
      """SELECT doc_id,
        |  regexp_replace('\(' || source || '\) \*x\*', '\\([^\w\s])', '\1', 'g') AS cleaned
        |FROM documents""".stripMargin,
    "q_parse_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q_parse_date_labels" ->
      """SELECT event_id, strftime(ts, '%B %Y') AS month_label,
        |  CAST(weekofyear(ts) AS INT) AS iso_week
        |FROM events""".stripMargin,
    // Mirrors ParseEngine for the mode/total fixtures: the level and
    // total-level variant regexes (icon prefix included), a startsWith
    // badge check for the game mode, and the prefixed-type-compared
    // skill default.
    "q_parse_modes" ->
      """WITH m AS (
        |  SELECT event_id, CASE
        |    WHEN event_type = 'purchase' THEN printf('user_%d has reached Fishing level %d.',
        |      user_id, event_id % 99 + 1)
        |    WHEN event_type = 'click' AND event_id % 2 = 0 THEN printf('user_%d has reached a total level of %d.',
        |      user_id, event_id % 1777 + 500)
        |    WHEN event_type = 'click' THEN printf('<:Leagues_IV_badge:123> user_%d has reached a total level of %d.',
        |      user_id, event_id % 1777 + 500)
        |    WHEN event_type = 'signup' THEN printf('<:Leagues_IV_badge:123> user_%d has reached Attack level %d.',
        |      user_id, event_id % 99 + 1)
        |    ELSE printf('noise event %d', event_id) END AS msg
        |  FROM events),
        |p AS (
        |  SELECT event_id AS raw_log_id, msg,
        |    CASE WHEN msg LIKE '<:Leagues_IV_badge:123>%' THEN '(Leagues) ' ELSE '' END AS pre,
        |    regexp_matches(msg, '^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached ([\w\s]+) level (\d+)\.?$') AS is_lvl,
        |    regexp_matches(msg, '^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached a total level of (\d+)\.?$') AS is_tot
        |  FROM m),
        |lvl AS (
        |  SELECT raw_log_id, pre || 'Level Up' AS broadcast_type,
        |    trim(regexp_extract(msg, '^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached ([\w\s]+) level (\d+)\.?$', 1)) AS username,
        |    trim(regexp_extract(msg, '^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached ([\w\s]+) level (\d+)\.?$', 2)) AS skill,
        |    CAST(regexp_extract(msg, '^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached ([\w\s]+) level (\d+)\.?$', 3) AS INT) AS new_level
        |  FROM p WHERE is_lvl),
        |tot AS (
        |  SELECT raw_log_id, pre || 'Total Level' AS broadcast_type,
        |    trim(regexp_extract(msg, '^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached a total level of (\d+)\.?$', 1)) AS username,
        |    CASE WHEN pre = '' THEN 'Total' END AS skill,
        |    CAST(regexp_extract(msg, '^(?:<:\w+:\d+>){0,2}\s*(.+?)\s+has reached a total level of (\d+)\.?$', 2) AS INT) AS new_level
        |  FROM p WHERE is_tot AND NOT is_lvl)
        |SELECT * FROM lvl UNION ALL SELECT * FROM tot""".stripMargin,
    // Mirrors ParseEngine's chat-first dispatch: escape cleanup, the
    // chat regex with its optional status group (unmatched group → '' in
    // DuckDB → NULL via NULLIF, same as the engine's blank→null
    // coercion), and level-pattern broadcasts only for rows the chat
    // regex did NOT claim.
    "q_parse_chat" ->
      s"""WITH m AS (
         |  SELECT event_id, CASE event_type
         |    WHEN 'purchase' THEN printf('<:rank_%d:100>**user_%d**: dropped \\*%d\\* coins',
         |      event_id % 5, user_id, event_id)
         |    WHEN 'click' THEN printf('<:rank_%d:100><:status_on:9>  **user_%d**:   ',
         |      event_id % 5, user_id)
         |    WHEN 'signup' THEN printf('<:rank_%d:100>**user_%d**: received a drop: Item_%d (500 coins) from Mob_1.',
         |      event_id % 5, user_id, event_id % 50)
         |    ELSE printf('user_%d has reached Attack level %d.', user_id, event_id % 99 + 1)
         |    END AS msg
         |  FROM events),
         |c AS (
         |  SELECT event_id AS raw_log_id,
         |    regexp_replace(msg, '\\\\([^\\w\\s])', '\\1', 'g') AS content
         |  FROM m)
         |SELECT raw_log_id, 'chat' AS message_type,
         |  NULLIF(trim(regexp_extract(content, '$chatPat', 1)), '') AS rank,
         |  NULLIF(trim(regexp_extract(content, '$chatPat', 2)), '') AS status,
         |  NULLIF(trim(regexp_extract(content, '$chatPat', 3)), '') AS username,
         |  NULLIF(trim(regexp_extract(content, '$chatPat', 4)), '') AS info
         |FROM c WHERE regexp_matches(content, '$chatPat')
         |UNION ALL
         |SELECT raw_log_id, 'broadcast' AS message_type,
         |  NULL AS rank, NULL AS status,
         |  trim(regexp_extract(content, '$levelPat', 1)) AS username,
         |  'Level Up' AS info
         |FROM c WHERE NOT regexp_matches(content, '$chatPat')
         |  AND regexp_matches(content, '$levelPat')""".stripMargin,
    "q_osrs_leaderboard_e2e" ->
      s"""WITH m AS (SELECT event_id, ts, $messageSql AS msg FROM events),
         |p AS (
         |  SELECT ts,
         |    trim(regexp_extract(msg, '$dropPat', 1)) AS username,
         |    CAST(replace(regexp_extract(msg, '$dropPat', 3), ',', '') AS BIGINT) AS item_value
         |  FROM m WHERE regexp_matches(msg, '$dropPat'))
         |SELECT username,
         |  count(*) FILTER (WHERE ts < TIMESTAMP '2024-02-01') AS count_all_time,
         |  CAST(COALESCE(sum(item_value) FILTER (WHERE ts < TIMESTAMP '2024-02-01'), 0) AS BIGINT) AS value_all_time,
         |  count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15') AS count_jan_h1,
         |  CAST(COALESCE(sum(item_value) FILTER (WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'), 0) AS BIGINT) AS value_jan_h1,
         |  count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-02-01') AS count_jan_h2,
         |  CAST(COALESCE(sum(item_value) FILTER (WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-02-01'), 0) AS BIGINT) AS value_jan_h2
         |FROM p GROUP BY username""".stripMargin)
}
