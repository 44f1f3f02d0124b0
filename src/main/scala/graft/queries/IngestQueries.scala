package graft.queries

import graft.Tables
import graft.ingest.{IncrementalIngest, NameChanges}
import graft.ops.{AsOfJoin, Dedup}
import org.apache.spark.sql.functions._

/** Incremental-ingest contracts (SURVEY.md §2.1 S2/S3, §2.3 J4/J6/J7)
  * exercised over the fixtures: watermark range resolution, idempotent
  * append, dead-letter retry/cleanup joins, and the as-of join (DuckDB has
  * native ASOF JOIN — backward + forward passes compose the reference's
  * 3-probe fallback).
  */
object IngestQueries extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // S2: watermark minus overlap — rows that would be re-fetched.
    "q_ingest_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val wm = ev.agg(max(col("ts")).as("__wm"))
      ev.crossJoin(broadcast(wm))
        .filter(col("ts") >= col("__wm") - expr("INTERVAL 600 SECONDS"))
        .agg(count(lit(1)).as("n_refetched"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    }),

    // S3: idempotent append — incoming overlap minus already-stored rows.
    "q_ingest_append" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val existing = ev.filter(col("ts") < lit("2024-01-15"))
      val incoming = ev.filter(col("ts") >= lit("2024-01-14") && col("ts") < lit("2024-01-16"))
      IncrementalIngest.rowsToAppend(existing, incoming, Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    // J6: watermark scan ∪ dead-letter retry, deduped.
    "q_ingest_retry" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumnRenamed("event_id", "id")
      val watermark = 6000L
      val deadLetter = ev.filter(col("event_type") === "error" && col("id") <= watermark)
        .select(col("id").as("raw_log_id"))
      IncrementalIngest.rowsToParse(ev, Some(watermark), deadLetter)
        .select(col("id"), col("event_type"))
    }),

    // J7: dead-letter cleanup after a successful parse wave.
    "q_ingest_deadletter_cleanup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val deadLetter = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("raw_log_id"), col("user_id"))
      val parsedIds = ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .select(col("event_id").as("raw_log_id"))
      IncrementalIngest.cleanDeadLetter(deadLetter, parsedIds)
    }),

    // J4: as-of join — purchases priced by each user's latest prior 'view'
    // value, falling forward for purchases before any view.
    "q_asof_price" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val build = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("price_ts"),
          round(col("value"), 2).cast("decimal(18,2)").as("price"))
      AsOfJoin.join(probes, build, Seq("user_id"), "ts", "price_ts", Seq("price"))
        .select(col("event_id"), col("user_id"), col("price").cast("double").as("price"))
    }),

    // S13: name-change sync — embed scan → arrow parse → exclusive-cursor
    // resume with a STALE watermark (overlap re-read), idempotent append.
    // Output = the rows the batch would actually insert.
    "q_name_changes" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val messages = ev.select(
        col("event_id").as("message_id"),
        col("ts").as("created_at"),
        when(col("event_type") === "signup", lit(NameChanges.EmbedTitle))
          .otherwise(lit("Other Embed")).as("embed_title"),
        when(pmod(col("event_id"), lit(5)) === 0, lit("no arrow in this embed"))
          .when(pmod(col("event_id"), lit(2)) === 0,
            format_string("user_%d → user_%d", col("user_id"), col("user_id") + 1000))
          .otherwise( // padded variant exercises the trim path
            format_string("  user_%d  →  user_%d  ", col("user_id"), col("user_id") + 1000))
          .as("embed_description"))
      val existing = NameChanges.parse(messages.filter(col("message_id") <= 6000))
      val scanned = NameChanges.afterWatermark(messages, Some(5000L))
      NameChanges.rowsToAppend(existing, NameChanges.parse(scanned))
        .select(col("discord_message_id"), col("old_name"), col("new_name"),
          date_format(col("change_timestamp"), "yyyy-MM-dd HH:mm:ss").as("change_ts"))
    }),

    // W7-adjacent: deterministic keep-first over a union with duplicates.
    "q_ingest_union_dedup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("ts") < lit("2024-01-20"))
      val b = ev.filter(col("ts") >= lit("2024-01-10"))
      Dedup.keepFirst(a.unionByName(b), Seq("event_id"), Seq(col("ts").asc))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_rows"))
    }))

  val oracles: Map[String, String] = Map(
    "q_ingest_overlap" ->
      """SELECT count(*) AS n_refetched, min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 600 SECONDS""".stripMargin,
    "q_ingest_append" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-14' AND ts < TIMESTAMP '2024-01-16'
        |  AND event_id NOT IN (
        |    SELECT event_id FROM events WHERE ts < TIMESTAMP '2024-01-15')""".stripMargin,
    "q_ingest_retry" ->
      """SELECT event_id AS id, event_type FROM events
        |WHERE event_id > 6000
        |   OR (event_type = 'error' AND event_id <= 6000)""".stripMargin,
    "q_ingest_deadletter_cleanup" ->
      """SELECT event_id AS raw_log_id, user_id FROM events
        |WHERE event_type = 'error' AND event_id % 2 <> 0""".stripMargin,
    "q_asof_price" ->
      """WITH probes AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |build AS (
        |  SELECT user_id, ts AS price_ts, CAST(round(value, 2) AS DECIMAL(18,2)) AS price
        |  FROM events WHERE event_type = 'view'),
        |backward AS (
        |  SELECT probes.event_id, probes.user_id, build.price
        |  FROM probes ASOF LEFT JOIN build
        |    ON probes.user_id = build.user_id AND probes.ts >= build.price_ts),
        |forward AS (
        |  SELECT probes.event_id, build.price
        |  FROM probes ASOF LEFT JOIN build
        |    ON probes.user_id = build.user_id AND probes.ts < build.price_ts)
        |SELECT b.event_id, b.user_id, CAST(COALESCE(b.price, f.price) AS DOUBLE) AS price
        |FROM backward b JOIN forward f ON b.event_id = f.event_id""".stripMargin,
    "q_name_changes" ->
      """SELECT event_id AS discord_message_id,
        |  'user_' || user_id AS old_name,
        |  'user_' || (user_id + 1000) AS new_name,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS change_ts
        |FROM events
        |WHERE event_type = 'signup' AND event_id % 5 <> 0
        |  AND event_id > 5000
        |  AND event_id NOT IN (
        |    SELECT event_id FROM events
        |    WHERE event_type = 'signup' AND event_id % 5 <> 0 AND event_id <= 6000)""".stripMargin,
    "q_ingest_union_dedup" ->
      """SELECT event_type, count(*) AS n_rows FROM (
        |  SELECT DISTINCT event_id, event_type FROM (
        |    SELECT event_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-20'
        |    UNION ALL
        |    SELECT event_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-10'))
        |GROUP BY event_type""".stripMargin)
}
