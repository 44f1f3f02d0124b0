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
    // WARC (ISO 28500) encode→parse roundtrip over the documents table:
    // each doc renders to a spec-shaped record, the parser streams it
    // back, and the oracle recomputes the recovered fields (UTF-8 octet
    // length, uri-embedded id) straight from the table — a codec bug on
    // either side breaks the hash.
    "q_warc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val prefix = "http://example.com/doc/"
      graft.Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.flatMap { case (id, text) =>
            val bytes = graft.sources.Warc.render(graft.sources.Warc.Record(
              "response", s"$prefix$id", Map("WARC-Record-ID" -> s"<urn:doc:$id>"),
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            graft.sources.Warc.parseAll(bytes).map(_._2)
          }
        }
        .map(r => (r.targetUri.stripPrefix(prefix).toLong, r.warcType,
          r.body.length.toLong))
        .toDF("doc_id", "warc_type", "content_length")
    }),

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

    // J4 via the native Catalyst node (AsOfJoinPlan → AsOfJoinExec): same
    // semantics, planned as a co-partitioned sort-merge instead of the
    // union+window rewrite. Same oracle as q_asof_price.
    "q_asof_native" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val build = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("price_ts"),
          round(col("value"), 2).cast("decimal(18,2)").as("price"))
      AsOfJoin.joinNative(probes, build, Seq("user_id"), "ts", "price_ts", Seq("price"))
        .select(col("event_id"), col("user_id"), col("price").cast("double").as("price"))
    }),

    // J4 under planted skew: the salted as-of (deterministic probe salt,
    // whole-series build replication) must reproduce the unsalted result
    // exactly — same oracle as q_asof_price. user_id is Zipf-ish in the
    // fixture, so the salt genuinely spreads real hot keys here.
    "q_asof_salted" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val build = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("price_ts"),
          round(col("value"), 2).cast("decimal(18,2)").as("price"))
      AsOfJoin.saltedJoin(probes, build, Seq("user_id"), "ts", "price_ts",
        Seq("price"), saltCol = "event_id", numSalts = 8)
        .select(col("event_id"), col("user_id"),
          col("price").cast("double").as("price"))
    }),

    // J4 self-routing: joinAuto picks broadcast / salted / plain merge on
    // its own (build-size stat, then a sampled probe-key histogram). The
    // route must be invisible in the result — same oracle again. Exact
    // histogram here (sampleFraction=1) so the graded run's routing is
    // deterministic at every sf.
    "q_asof_auto" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val build = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("price_ts"),
          round(col("value"), 2).cast("decimal(18,2)").as("price"))
      AsOfJoin.joinAuto(probes, build, Seq("user_id"), "ts", "price_ts",
        Seq("price"), saltCol = Some("event_id"), sampleFraction = 1.0)
        .select(col("event_id"), col("user_id"),
          col("price").cast("double").as("price"))
    }),

    // J4 through PURE SQL: the asof_time join-condition marker
    // (expr/AsOfTime + plans/RewriteAsOfTimeJoin) turns a plain
    // `JOIN ... ON key = key AND asof_time(pt, bt)` into the native
    // AsOfJoinPlan — a SQL-first user reaches the engine's best operator
    // without touching the Scala API. Default strategy = backward, the
    // DuckDB `ASOF JOIN` convention, which is what the oracle runs.
    "q_asof_sql" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      graft.plans.AsOfJoinStrategy.register(s)
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("asof_sql_probes")
      ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("price_ts"),
          round(col("value"), 2).cast("decimal(18,2)").as("price"))
        .createOrReplaceTempView("asof_sql_build")
      s.sql(
        """SELECT p.event_id, p.user_id, CAST(b.price AS DOUBLE) AS price
          |FROM asof_sql_probes p LEFT JOIN asof_sql_build b
          |  ON p.user_id = b.user_id AND asof_time(p.ts, b.price_ts)""".stripMargin)
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

    // P8: the REAL value-override enrichment — falsy Item_Value rows take
    // the latest same-or-earlier day's price (else earliest later) for
    // items configured with a dynamic id, the constant fallback when no
    // price resolves, and the reference quirk: a falsy value on an
    // UNCONFIGURED item becomes NULL.
    "q_value_override" -> ((s, dir) => {
      import graft.parse.ValueOverride
      val ev = Tables.events(s, dir)
      val prices = ev.filter(col("event_type") === "view")
        .select(
          when(pmod(col("event_id"), lit(2)) === 0, "2").otherwise("6").as("item_id"),
          col("ts").as("timestamp"),
          round(col("value") * 1000, 0).cast("long").as("avg_high_price"))
      val broadcasts = ev.filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("raw_log_id"),
          col("ts").as("Timestamp"),
          when(pmod(col("event_id"), lit(4)) === 0, "Cannonball")
            .when(pmod(col("event_id"), lit(4)) === 1, "Rune arrow")
            .when(pmod(col("event_id"), lit(4)) === 2, "Static item")
            .otherwise("Unconfigured").as("Item_Name"),
          when(pmod(col("event_id"), lit(5)) === 0, lit(0L))
            .when(pmod(col("event_id"), lit(5)) === 1, lit(null).cast("long"))
            .otherwise(round(col("value") * 100, 0).cast("long")).as("Item_Value"))
      val overrides = Seq(
        ValueOverride("Cannonball", Some(180L), Some("2")),
        ValueOverride("Rune arrow", None, Some("6")),
        ValueOverride("Static item", Some(5L), None))
      graft.enrich.Enrichment.applyValueOverrides(broadcasts, overrides, prices)
        .select(col("raw_log_id"), col("Item_Name").as("item_name"),
          col("Item_Value").as("item_value"))
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
    // The roundtripped fields re-derived directly from the table: UTF-8
    // octet length (DuckDB strlen) and the constant record type.
    "q_warc_roundtrip" ->
      """SELECT doc_id, 'response' AS warc_type,
        |  CAST(strlen(text) AS BIGINT) AS content_length
        |FROM documents""".stripMargin,

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
    // Identical oracle: the native plan must agree with the window form.
    "q_asof_native" ->
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
    // Salting must be invisible in the result: same oracle as
    // q_asof_price/q_asof_native.
    "q_asof_salted" ->
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
    // Auto-routing must be invisible too: identical oracle.
    "q_asof_auto" ->
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

    // The SQL-marker path runs plain backward asof — DuckDB's own ASOF
    // LEFT JOIN is the oracle, symbol for symbol.
    "q_asof_sql" ->
      """WITH probes AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |build AS (
        |  SELECT user_id, ts AS price_ts, CAST(round(value, 2) AS DECIMAL(18,2)) AS price
        |  FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, CAST(b.price AS DOUBLE) AS price
        |FROM probes p ASOF LEFT JOIN build b
        |  ON p.user_id = b.user_id AND p.ts >= b.price_ts""".stripMargin,

    // Mirrors Enrichment.applyValueOverrides: latest price per (item, day)
    // via row_number, backward then forward ASOF on the probe DATE, then
    // CASE with the unconfigured-item null quirk.
    "q_value_override" ->
      """WITH prices AS (
        |  SELECT CASE WHEN event_id % 2 = 0 THEN '2' ELSE '6' END AS item_id,
        |    ts, CAST(round(value * 1000, 0) AS BIGINT) AS p
        |  FROM events WHERE event_type = 'view'),
        |daily AS (
        |  SELECT item_id, d, p FROM (
        |    SELECT item_id, CAST(ts AS DATE) AS d, p,
        |      row_number() OVER (PARTITION BY item_id, CAST(ts AS DATE)
        |        ORDER BY ts DESC) AS rn
        |    FROM prices) WHERE rn = 1),
        |bc AS (
        |  SELECT event_id AS raw_log_id, CAST(ts AS DATE) AS pdate,
        |    CASE event_id % 4 WHEN 0 THEN 'Cannonball' WHEN 1 THEN 'Rune arrow'
        |      WHEN 2 THEN 'Static item' ELSE 'Unconfigured' END AS item_name,
        |    CASE WHEN event_id % 5 = 0 THEN 0
        |      WHEN event_id % 5 = 1 THEN NULL
        |      ELSE CAST(round(value * 100, 0) AS BIGINT) END AS iv
        |  FROM events WHERE event_type = 'purchase'),
        |dim(item, fallback, oid) AS (VALUES
        |  ('Cannonball', 180, '2'), ('Rune arrow', NULL, '6'),
        |  ('Static item', 5, NULL)),
        |j AS (
        |  SELECT bc.*, dim.fallback, dim.oid
        |  FROM bc LEFT JOIN dim ON bc.item_name = dim.item),
        |bw AS (
        |  SELECT j.raw_log_id, daily.p
        |  FROM j ASOF LEFT JOIN daily
        |    ON j.oid = daily.item_id AND j.pdate >= daily.d),
        |fw AS (
        |  SELECT j.raw_log_id, daily.p
        |  FROM j ASOF LEFT JOIN daily
        |    ON j.oid = daily.item_id AND j.pdate < daily.d)
        |SELECT j.raw_log_id, j.item_name,
        |  CAST(CASE WHEN (j.iv IS NULL OR j.iv = 0) AND j.item_name IS NOT NULL
        |    THEN COALESCE(bw.p, fw.p, j.fallback) ELSE j.iv END AS BIGINT) AS item_value
        |FROM j
        |JOIN bw ON j.raw_log_id = bw.raw_log_id
        |JOIN fw ON j.raw_log_id = fw.raw_log_id""".stripMargin,
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
