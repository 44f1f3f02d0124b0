package graft.reports

import graft.expr.ParseDuration.parseDuration
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Personal-bests summary (`/root/reference/src/3_transform_data.py:516-732`)
  * — the reference's hardest report, re-expressed with window functions:
  *
  *  1. union historical records (config) with DB Personal Best broadcasts;
  *  2. canonicalize task names case-insensitively (config wins, then
  *     first-seen);
  *  3. blacklist rules (global user / user+task / user+task+max_time) and
  *     CNF-style task exclusion rules;
  *  4. per task: min seconds (with the "0:00" → ∞ historical sentinel),
  *     keep rows within the similarity threshold, anchor a grouping window
  *     at the earliest such row, collect holders (historical holder list of
  *     the first historical achiever + DB achievers in the window, plus
  *     later achievers when allowed), definitive record = earliest row;
  *  5. re-add historical tasks that lost every record to the blacklist.
  *
  * Output: Task, Holder (", "-joined sorted distinct), Time, Date, Group.
  *
  * Shape: one shuffle on Task_Name (the windows + the final groupBy share
  * it), config-sized broadcast joins for canon/group maps.
  */
object PersonalBests {

  private val MinTs = java.sql.Timestamp.valueOf("0001-01-01 00:00:00")

  /** @param singlePass step 4 via [[graft.expr.PbRecordAgg]] (one typed
    *   partial aggregate: map-side combine, no per-task sort, shuffle
    *   carries only threshold-band candidates) instead of the window
    *   formulation (whole-group shuffle + in-partition sort). Same result —
    *   PersonalBestsSpec asserts bit-identity and q_pb_singlepass runs the
    *   same DuckDB oracle as q_pb_report.
    */
  def generate(
      broadcasts: DataFrame,
      pbDef: PersonalBestsDef,
      hist: PbHistoricalData,
      singlePass: Boolean = false): DataFrame = {
    val spark = broadcasts.sparkSession
    import spark.implicits._

    // --- 1. historical + DB union -------------------------------------
    val histRows = hist.records.zipWithIndex.map { case (r, i) =>
      (r.task, r.time, r.holders.headOption.getOrElse(""), r.holders,
        r.date.getOrElse(null), i.toLong)
    }
    val histDf = histRows
      .toDF("Task_Name", "PB_Time", "Username", "All_Holders", "manual_date", "config_idx")
      .withColumn("Timestamp",
        coalesce(to_timestamp(col("manual_date")), lit(MinTs)))
      .withColumn("is_historical", lit(true))
      .withColumn("raw_log_id", lit(null).cast("long"))

    val dbDf = broadcasts
      .filter(col("Broadcast_Type") === pbDef.broadcastType)
      .select(col("Task_Name"), col("PB_Time"), col("Username"),
        lit(null).cast("array<string>").as("All_Holders"),
        lit(null).cast("string").as("manual_date"),
        lit(null).cast("long").as("config_idx"),
        col("Timestamp"),
        lit(false).as("is_historical"),
        col("raw_log_id"))

    val all = histDf.unionByName(dbDf)

    // --- 2. canonical task names --------------------------------------
    // Config entries first (LAST config entry wins per lower-cased name —
    // dict-assignment order), then first-seen DB spellings.
    val canonOrder = Window.partitionBy(col("__lower")).orderBy(
      col("__prio").asc, col("__cfg_ord").asc, col("Timestamp").asc,
      col("raw_log_id").asc_nulls_last)
    val canon = all
      .filter(col("Task_Name").isNotNull)
      .select(lower(col("Task_Name")).as("__lower"), col("Task_Name").as("__canon"),
        when(col("is_historical"), lit(0)).otherwise(lit(1)).as("__prio"),
        when(col("is_historical"), -col("config_idx")).otherwise(lit(0L)).as("__cfg_ord"),
        col("Timestamp"), col("raw_log_id"))
      .withColumn("__rn", row_number().over(canonOrder))
      .filter(col("__rn") === 1)
      .select("__lower", "__canon")

    val canonical = all
      .withColumn("__lower", lower(col("Task_Name")))
      .join(broadcast(canon), Seq("__lower"), "left")
      .withColumn("Task_Name", coalesce(col("__canon"), col("Task_Name")))
      .drop("__lower", "__canon")

    // --- 3. blacklist + exclusion rules -------------------------------
    // Holder-array scrub applies to every no-task rule (reference checks
    // only `'task_name' not in rule`, regardless of max_time — :602-609).
    val globalUsers = hist.blacklist.collect {
      case PbBlacklistRule(u, None, _) if u.nonEmpty => u
    }
    val scrubbed =
      if (globalUsers.isEmpty) canonical
      else canonical.withColumn("All_Holders",
        when(col("All_Holders").isNotNull,
          array_except(col("All_Holders"), array(globalUsers.map(lit): _*)))
          .otherwise(col("All_Holders")))

    val keep = hist.blacklist.foldLeft(lit(true)) { (acc, rule) =>
      val dropMask: Column = (rule.taskName, rule.maxTime) match {
        case (None, None) => col("Username") === rule.username
        case (None, Some(_)) => lit(false) // invalid shape: reference warns + skips
        case (Some(t), None) =>
          col("Username") === rule.username && col("Task_Name") === t
        case (Some(t), Some(mt)) =>
          col("Username") === rule.username && col("Task_Name") === t &&
            parseDuration(col("PB_Time")) < lit(graft.expr.ParseDuration.parse(
              org.apache.spark.unsafe.types.UTF8String.fromString(mt)))
      }
      acc && !coalesce(dropMask, lit(false))
    }
    val excluded = hist.excludeRules.foldLeft(lit(false)) { (acc, ruleSet) =>
      acc || ruleSet.map(s => coalesce(col("Task_Name").contains(s), lit(false)))
        .reduce(_ && _)
    }
    val filtered = scrubbed.filter(keep && !excluded)

    // --- 4. per-task record reduction ---------------------------------
    val seconds = when(col("is_historical") && col("PB_Time") === "0:00",
      lit(Double.PositiveInfinity)).otherwise(parseDuration(col("PB_Time")))
    val withSec = filtered
      .filter(col("Task_Name").isNotNull)
      .withColumn("__sec", seconds)

    val dateStr = when(!col("is_historical"),
      date_format(col("Timestamp"), "yyyy-MM-dd"))
      .otherwise(when(col("manual_date").isNotNull && col("manual_date") =!= "",
        col("manual_date")))

    val reduced = if (singlePass) {
      import org.apache.spark.sql.GraftColumnBridge.{column, expression}
      val agg = graft.expr.PbRecordAgg(
        expression(col("__sec")), expression(col("Timestamp")),
        expression(col("is_historical")), expression(col("config_idx")),
        expression(col("raw_log_id")), expression(col("PB_Time")),
        expression(dateStr), expression(col("Username")),
        expression(col("All_Holders")),
        pbDef.similarityThresholdSeconds, pbDef.groupingWindowSeconds,
        pbDef.allowMultipleHolders)
      withSec
        .groupBy(col("Task_Name").as("Task"))
        .agg(column(agg.toAggregateExpression()).as("__r"))
        .filter(col("__r").isNotNull) // no parseable time at all: window form drops these rows
        .select(col("Task"),
          col("__r.time").as("Time"), col("__r.date").as("Date"),
          col("__r.hist_holders").as("__hist_holders"),
          col("__r.db_holders").as("__db_holders"),
          col("__r.later_holders").as("__later_holders"))
    } else {
      val byTask = Window.partitionBy(col("Task_Name"))
      val ord = byTask.orderBy(col("Timestamp").asc, col("is_historical").desc,
        col("config_idx").asc_nulls_last, col("raw_log_id").asc_nulls_last)

      val kept = withSec
        .withColumn("__min_sec", min(col("__sec")).over(byTask))
        .filter(col("__min_sec") === Double.PositiveInfinity ||
          abs(col("__sec") - col("__min_sec")) <= pbDef.similarityThresholdSeconds)
        .withColumn("__rn", row_number().over(ord))
        .withColumn("__first_ts", min(col("Timestamp")).over(byTask))
        .withColumn("__cutoff",
          col("__first_ts") + expr(s"INTERVAL ${pbDef.groupingWindowSeconds} SECONDS"))
        .withColumn("__achiever", col("Timestamp") <= col("__cutoff"))

      val later = collect_list(
        when(!col("__achiever") && lit(pbDef.allowMultipleHolders), col("Username")))

      kept
        .withColumn("__date_str", dateStr)
        .groupBy(col("Task_Name").as("Task"))
        .agg(
          max(when(col("__rn") === 1, col("PB_Time"))).as("Time"),
          max(when(col("__rn") === 1, col("__date_str"))).as("Date"),
          min_by(
            when(col("is_historical") && col("__achiever"), col("All_Holders")),
            when(col("is_historical") && col("__achiever"), col("__rn"))).as("__hist_holders"),
          collect_list(when(!col("is_historical") && col("__achiever"), col("Username")))
            .as("__db_holders"),
          later.as("__later_holders"))
    }

    val holders = array_join(
      array_sort(array_distinct(filter(
        concat(
          coalesce(col("__hist_holders"), array().cast("array<string>")),
          col("__db_holders"), col("__later_holders")),
        h => h.isNotNull && h =!= ""))),
      ", ")

    // --- 5. groups + missing-task backfill ----------------------------
    // task→group: later config records overwrite earlier (dict semantics).
    val groupMap = hist.records.zipWithIndex
      .groupBy(_._1.task).view.mapValues(_.maxBy(_._2)._1.group).toMap
    val groupDim = groupMap.toSeq.toDF("Task", "__group")

    val summary = reduced
      .withColumn("Holder", holders)
      .join(broadcast(groupDim), Seq("Task"), "left")
      .select(col("Task"), col("Holder"), col("Time"), col("Date"),
        coalesce(col("__group"), lit(hist.otherGroupName)).as("Group"))

    val allHistTasks = hist.records.map(_.task).distinct.toDF("Task")
    val missing = allHistTasks
      .join(summary.select("Task"), Seq("Task"), "left_anti")
      .join(broadcast(groupDim), Seq("Task"), "left")
      .select(col("Task"), lit("").as("Holder"), lit("0:00").as("Time"),
        lit(null).cast("string").as("Date"),
        coalesce(col("__group"), lit(hist.otherGroupName)).as("Group"))

    summary.unionByName(missing)
  }
}
