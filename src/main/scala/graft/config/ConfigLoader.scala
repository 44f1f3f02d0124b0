package graft.config

import java.sql.Timestamp

import graft.OsrsPipeline
import graft.parse.{GameModeRule, GroupDef, ParseConfig, ValueOverride, VariantDef}
import graft.reports._

/** Maps parsed TOML (same file shapes as the reference's
  * `config.example.toml` + the two historical TOMLs) onto the engine's
  * config case classes, so a reference user's existing config files drive
  * this engine unchanged.
  */
object ConfigLoader {

  private def str(v: Any): String = v.asInstanceOf[String]
  private def strSeq(v: Any): Seq[String] = v match {
    case s: String => Seq(s)
    case xs: Seq[_] => xs.map(str)
    case null => Seq.empty
  }
  private def table(v: Any): Toml.Table = v.asInstanceOf[Toml.Table]
  private def tables(v: Any): Seq[Toml.Table] =
    v.asInstanceOf[Seq[Any]].map(table)

  private def ts(v: Any): Option[Timestamp] = v match {
    case null => None
    case s: String if s.trim.nonEmpty =>
      val norm = if (s.length == 16) s + ":00" else s // "YYYY-MM-DD HH:MM"
      Some(Timestamp.valueOf(norm.replace("T", " ")))
    case _ => None
  }

  /** `[patterns]` → [[ParseConfig]]; declaration order is dispatch order. */
  def parseConfig(root: Toml.Table): ParseConfig = {
    val patterns = table(root("patterns"))
    val chat = table(patterns("Chat"))

    val groups = patterns.toSeq.collect {
      case (name, g: Map[String @unchecked, Any @unchecked])
          if name != "Chat" && g.contains("broadcast_type") =>
        GroupDef(
          name,
          str(g("broadcast_type")),
          tables(g.getOrElse("variants", Seq.empty)).map { v =>
            VariantDef(
              str(v("regex")),
              strSeq(v.getOrElse("columns", Seq.empty)),
              strSeq(v.getOrElse("required_columns", Seq.empty)))
          })
    }

    val gameModes = root.get("parse_settings").map(table)
      .flatMap(_.get("game_modes")).map(table).getOrElse(Map.empty)
      .toSeq.map { case (mode, rules) =>
        val prefixes = rules match {
          case s: String => Seq(s)
          case xs: Seq[_] if xs.nonEmpty && xs.head.isInstanceOf[String] =>
            Seq(xs.asInstanceOf[Seq[String]].mkString) // AND: concatenated
          case xs: Seq[_] => // OR of ANDs
            xs.map(_.asInstanceOf[Seq[String]].mkString)
          case _ => Seq.empty
        }
        GameModeRule(mode, prefixes)
      }

    val overrides = root.get("item_value_overrides").map(table)
      .getOrElse(Map.empty).toSeq.collect {
        case (item, v: Long) => ValueOverride(item, Some(v), None)
        case (item, xs: Seq[_]) if xs.size == 2 =>
          ValueOverride(item, Some(xs.head.asInstanceOf[Long]),
            Some(xs(1).toString))
      }

    ParseConfig(
      chatRegex = str(chat("regex")),
      chatColumns = strSeq(chat.getOrElse("columns", Seq.empty)),
      chatRequired = strSeq(chat.getOrElse("required_columns", Seq.empty)),
      groups = groups,
      gameModes = gameModes,
      valueOverrides = overrides)
  }

  /** `[username_mapping].rules` → [[MappingRule]]s (config order kept). */
  def mappingRules(root: Toml.Table): Seq[MappingRule] =
    root.get("username_mapping").map(table)
      .flatMap(_.get("rules")).map(tables).getOrElse(Seq.empty)
      .map(r => MappingRule(
        str(r("target_username")),
        strSeq(r.getOrElse("source_usernames", Seq.empty)),
        ts(r.getOrElse("start_date", null)),
        ts(r.getOrElse("end_date", null))))

  /** `[[exclusion_settings.ranges]]` → [[ExclusionRange]]s. */
  def exclusionRanges(root: Toml.Table): Seq[ExclusionRange] =
    root.get("exclusion_settings").map(table)
      .flatMap(_.get("ranges")).map(tables).getOrElse(Seq.empty)
      .flatMap { r =>
        for {
          s <- ts(r.getOrElse("start_date", null))
          e <- ts(r.getOrElse("end_date", null))
        } yield ExclusionRange(s, e, strSeq(r.getOrElse("exclude_types", Seq.empty)))
      }

  def leaderboards(dash: Toml.Table): Seq[LeaderboardReportDef] =
    dash.get("leaderboard_reports").map(tables).getOrElse(Seq.empty).map { rc =>
      val aggs = rc.get("aggregations").map(table).getOrElse(Map.empty)
      LeaderboardReportDef(
        reportName = str(rc("report_name")),
        sourceTable = rc.get("source_table").map(str).getOrElse("clan_broadcasts"),
        broadcastTypes = strSeq(rc.getOrElse("broadcast_type", Seq.empty)),
        itemNameFilter = rc.get("item_name_filter").map(str),
        searchPhrases = strSeq(rc.getOrElse("search_phrases", Seq.empty)),
        groupByColumn = str(rc("group_by_column")),
        countColumn = aggs.get("Count").map(str),
        valueColumn = aggs.get("Value").map(str))
    }

  def detailed(dash: Toml.Table): Seq[DetailedReportDef] =
    dash.get("detailed_reports").map(tables).getOrElse(Seq.empty).map(rc =>
      DetailedReportDef(str(rc("report_name_prefix")),
        strSeq(rc.getOrElse("broadcast_types", Seq.empty))))

  def timeseries(dash: Toml.Table): Seq[TimeseriesReportDef] =
    dash.get("timeseries_reports").map(tables).getOrElse(Seq.empty).map(rc =>
      TimeseriesReportDef(str(rc("report_name")),
        strSeq(rc.getOrElse("broadcast_type", Seq.empty)),
        strSeq(rc.getOrElse("frequencies", Seq("D")))))

  /** historical_personal_bests TOML → [[PbHistoricalData]]. */
  def pbHistorical(root: Toml.Table): PbHistoricalData = {
    val records = root.get("groups").map(tables).getOrElse(Seq.empty).flatMap { g =>
      val title = str(g("title"))
      g.get("records").map(tables).getOrElse(Seq.empty).map { r =>
        HistoricalPbRecord(
          group = title,
          task = str(r("name")),
          time = r.get("time").map(str).getOrElse("0:00"),
          holders = strSeq(r.getOrElse("holder", Seq.empty)).filter(_.nonEmpty),
          date = r.get("date").map(str).filter(_.nonEmpty))
      }
    }
    val blacklist = root.get("blacklist").map(tables).getOrElse(Seq.empty).map(r =>
      PbBlacklistRule(
        r.get("username").map(str).getOrElse(""),
        r.get("task_name").map(str),
        r.get("max_time").map(str)))
    PbHistoricalData(
      records = records,
      blacklist = blacklist,
      excludeRules = root.get("exclude_rules").map(_.asInstanceOf[Seq[Any]]
        .map(strSeq)).getOrElse(Seq.empty),
      otherGroupName = root.get("other_group_name").map(str)
        .getOrElse("Miscellaneous PBs"))
  }

  /** historical_collection_logs TOML → [[ClogHistoricalData]]. */
  def clogHistorical(root: Toml.Table): ClogHistoricalData =
    ClogHistoricalData(
      groups = root.get("groups").map(tables).getOrElse(Seq.empty).map(g =>
        str(g("title")) -> strSeq(g.getOrElse("items", Seq.empty))),
      initialCounts = root.get("initial_counts").map(tables).getOrElse(Seq.empty)
        .map(r => str(r("name")) -> r("count").asInstanceOf[Long]).toMap,
      excludeRules = root.get("exclude_rules").map(_.asInstanceOf[Seq[Any]]
        .map(strSeq)).getOrElse(Seq.empty),
      otherGroupName = root.get("other_group_name").map(str)
        .getOrElse("Miscellaneous Drops"))

  /** Assemble a full pipeline config from the three reference files. */
  def pipelineConfig(
      configToml: String,
      pbToml: String,
      clogToml: String): OsrsPipeline.Config = {
    val root = Toml.parse(configToml)
    val dash = root.get("dashboard_settings").map(table).getOrElse(Map.empty)
    val clogCfg = dash.get("collection_log").map(table).getOrElse(Map.empty)
    val pbCfg = dash.get("personal_bests").map(table).getOrElse(Map.empty)
    val recentCfg = dash.get("recent_achievements").map(table).getOrElse(Map.empty)

    OsrsPipeline.Config(
      parse = parseConfig(root),
      mappingRules = mappingRules(root),
      exclusionRanges = exclusionRanges(root),
      valueOverrides = parseConfig(root).valueOverrides,
      weekStartDay = dash.get("week_start_day").map(str).map(d =>
        java.time.DayOfWeek.valueOf(d.toUpperCase)).getOrElse(java.time.DayOfWeek.MONDAY),
      customLookbackDays = dash.get("custom_lookback_days")
        .map(_.asInstanceOf[Long].toInt).getOrElse(14),
      topDropsLimit = dash.get("top_drops_limit")
        .map(_.asInstanceOf[Long].toInt).getOrElse(50),
      leaderboards = leaderboards(dash),
      detailed = detailed(dash),
      timeseries = timeseries(dash),
      clog = CollectionLogDef(
        strSeq(clogCfg.getOrElse("source_types", Seq.empty)),
        clogCfg.get("deduplication_type").map(str)),
      clogHist = clogHistorical(Toml.parse(clogToml)),
      pb = PersonalBestsDef(
        pbCfg.get("broadcast_type").map(str).getOrElse("Personal Best"),
        pbCfg.get("pb_time_similarity_threshold_seconds") match {
          case Some(d: Double) => d
          case Some(l: Long) => l.toDouble
          case _ => 0.6
        },
        pbCfg.get("pb_grouping_window_seconds")
          .map(_.asInstanceOf[Long]).getOrElse(15L),
        pbCfg.get("allow_multiple_holders_on_match")
          .exists(_.asInstanceOf[Boolean])),
      pbHist = pbHistorical(Toml.parse(pbToml)),
      recent = RecentAchievementsDef(
        strSeq(recentCfg.getOrElse("source_types", Seq.empty)),
        recentCfg.get("limit_per_type").map(_.asInstanceOf[Long].toInt).getOrElse(15)))
  }

  /** Config-lint parity with the reference's `Validate_toml.py`
    * (reference `src/Validate_toml.py:13-55`): strictly parse each TOML
    * file and return `path → diagnostic` — None for a valid file, a
    * located [[Toml.TomlError]] (1-based line/column + the offending
    * line; `render` draws the reference's caret report) otherwise. A
    * missing file surfaces as line 0, like the reference's
    * FileNotFoundError branch.
    */
  def validate(paths: Seq[String]): Seq[(String, Option[Toml.TomlError])] =
    paths.map { p =>
      p -> {
        val text =
          try Some(new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8))
          catch { case _: java.io.IOException => None }
        text match {
          case None => Some(Toml.TomlError(0, 0, s"file not found: $p", ""))
          case Some(t) => Toml.validate(t)
        }
      }
    }
}
