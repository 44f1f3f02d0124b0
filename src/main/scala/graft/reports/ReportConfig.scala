package graft.reports

import java.sql.Timestamp
import java.time.{DayOfWeek, ZonedDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.WeekFields

/** Report-layer config — the same knobs the reference declares under
  * `[dashboard_settings]` (`/root/reference/src/config.example.toml:224-351`)
  * and the historical-record TOMLs, as plain case classes.
  */
case class LeaderboardReportDef(
    reportName: String,
    sourceTable: String = "clan_broadcasts",
    broadcastTypes: Seq[String] = Seq.empty, // empty = no type filter
    itemNameFilter: Option[String] = None,
    searchPhrases: Seq[String] = Seq.empty,
    groupByColumn: String,
    countColumn: Option[String],
    valueColumn: Option[String])

case class DetailedReportDef(reportNamePrefix: String, broadcastTypes: Seq[String])

case class TimeseriesReportDef(
    reportName: String,
    broadcastTypes: Seq[String],
    frequencies: Seq[String] = Seq("6h", "D", "W"))

case class CollectionLogDef(
    sourceTypes: Seq[String],
    deduplicationType: Option[String])

case class PersonalBestsDef(
    broadcastType: String = "Personal Best",
    similarityThresholdSeconds: Double = 0.6,
    groupingWindowSeconds: Long = 15,
    allowMultipleHolders: Boolean = false)

case class RecentAchievementsDef(sourceTypes: Seq[String], limitPerType: Int = 15)

/** Temporal username-mapping rule (`config.example.toml:80-116`). */
case class MappingRule(
    targetUsername: String,
    sourceUsernames: Seq[String],
    startDate: Option[Timestamp],
    endDate: Option[Timestamp])

/** Exclusion window (`config.example.toml:119-138`); `excludeTypes` may be
  * the sentinel "All Broadcasts". End date is INCLUSIVE (reference uses
  * `<=` here, unlike period filters).
  */
case class ExclusionRange(start: Timestamp, end: Timestamp, excludeTypes: Seq[String])

/** Historical personal-best record (historical_personal_bests.example.toml). */
case class HistoricalPbRecord(
    group: String,
    task: String,
    time: String,
    holders: Seq[String],
    date: Option[String])

case class PbBlacklistRule(username: String, taskName: Option[String], maxTime: Option[String])

case class PbHistoricalData(
    records: Seq[HistoricalPbRecord],
    blacklist: Seq[PbBlacklistRule] = Seq.empty,
    excludeRules: Seq[Seq[String]] = Seq.empty,
    otherGroupName: String = "Miscellaneous PBs")

case class ClogHistoricalData(
    groups: Seq[(String, Seq[String])], // (title, items) — an item may repeat
    initialCounts: Map[String, Long] = Map.empty,
    excludeRules: Seq[Seq[String]] = Seq.empty,
    otherGroupName: String = "Miscellaneous Drops")

/** One reporting period: [start, end) filter bounds + display label. */
case class Period(key: String, start: Option[Timestamp], end: Timestamp, label: String)

object Periods {

  /** The reference's five reporting windows
    * (`/root/reference/src/shared_utils.py:84-126`): All_Time, YTD,
    * Prev_Month (calendar), Prev_Week (config week start), Custom_Days.
    * Pure function of (runTime, config) — computed once on the driver and
    * folded into the conditional aggregations as literals.
    */
  def compute(
      runTime: ZonedDateTime,
      weekStartDay: DayOfWeek = DayOfWeek.MONDAY,
      customLookbackDays: Int = 14): Seq[Period] = {
    val utc = runTime.withZoneSameInstant(ZoneOffset.UTC)
    def ts(z: ZonedDateTime): Timestamp = Timestamp.from(z.toInstant)
    val midnight = utc.toLocalDate.atStartOfDay(ZoneOffset.UTC)

    val startOfYear = utc.toLocalDate.withDayOfYear(1).atStartOfDay(ZoneOffset.UTC)

    val endOfLastMonth = utc.toLocalDate.withDayOfMonth(1).atStartOfDay(ZoneOffset.UTC)
    val startOfLastMonth = endOfLastMonth.minusDays(1).toLocalDate
      .withDayOfMonth(1).atStartOfDay(ZoneOffset.UTC)

    val daysSinceWeekStart =
      (utc.getDayOfWeek.getValue - weekStartDay.getValue + 7) % 7
    val startOfCurrentWeek = midnight.minusDays(daysSinceWeekStart)
    val startOfPrevWeek = startOfCurrentWeek.minusDays(7)

    val startOfCustom = midnight.minusDays(customLookbackDays)

    val monthFmt = DateTimeFormatter.ofPattern("MMMM yyyy", java.util.Locale.ENGLISH)
    val isoWeek = startOfPrevWeek.get(WeekFields.ISO.weekOfWeekBasedYear())

    Seq(
      Period("All_Time", None, ts(utc), "All-Time"),
      Period("YTD", Some(ts(startOfYear)), ts(utc), s"Year-to-Date (${utc.getYear})"),
      Period("Prev_Month", Some(ts(startOfLastMonth)), ts(endOfLastMonth),
        startOfLastMonth.format(monthFmt)),
      Period("Prev_Week", Some(ts(startOfPrevWeek)), ts(startOfCurrentWeek), s"Week $isoWeek"),
      Period("Custom_Days", Some(ts(startOfCustom)), ts(utc), s"Last $customLookbackDays Days"))
  }
}
