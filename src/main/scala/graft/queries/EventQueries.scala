package graft.queries

import graft.Tables
import graft.ops.{Dedup, TimeSeries}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's report-engine semantics (SURVEY.md §2.2, §2.4–§2.7)
  * exercised over the driver's `events` table, which plays the role of the
  * silver broadcast table: `event_type` ↔ Broadcast_Type, `user_id` ↔
  * Username, `value` ↔ Item_Value, `ts` ↔ Timestamp.
  *
  * The flagship pattern is the single-pass period pivot (A2): the reference
  * runs one groupby per reporting period and merges 5 frames; we fold all
  * periods into conditional aggregates — ONE shuffle regardless of period
  * count, which is the difference between 1 and 5 full passes at 100 TB.
  */
object EventQueries extends QueryGroup {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Final money outputs: exact decimal arithmetic, emitted as double.
    * DECIMAL(18,2) in the output hashes differently across engines (Spark
    * keeps trailing zeros, DuckDB's client converts to float64); decimal →
    * double is correctly rounded on both, so both emit the identical float64.
    */
  private def dbl(c: Column): Column = dec(c).cast("double")

  /** Reporting periods over the fixture's January 2024 range (T2: computed
    * driver-side, folded in as literals — mirrors the reference computing
    * period bounds once per run in `shared_utils.py:84-126`).
    */
  val periods: Seq[(String, String, String)] = Seq(
    ("week1", "2024-01-01", "2024-01-08"),
    ("mid", "2024-01-08", "2024-01-22"),
    ("last_week", "2024-01-24", "2024-01-31"))

  /** P19: exclusion windows — drop rows inside [start,end) for listed types
    * (or all types), as Column predicate compiled from "config".
    */
  val exclusionRules: Seq[(String, String, Seq[String])] = Seq(
    ("2024-01-05", "2024-01-07", Seq("error")),
    ("2024-01-15", "2024-01-16", Seq.empty)) // empty = all types

  def exclusionPredicate(ts: Column, tpe: Column): Column =
    exclusionRules.map { case (s, e, types) =>
      val inWindow = ts >= lit(s) && ts < lit(e)
      if (types.isEmpty) inWindow else inWindow && tpe.isin(types.map(lit): _*)
    }.reduce(_ || _)

  /** A5/A6/J8/P22 composite: the REAL personal-bests generator — the
    * "0:00" → ∞ historical sentinel, similarity-threshold record groups,
    * grouping-window achievers vs later holders, historical holder lists,
    * manual vs derived dates, a global blacklist scrub, and the
    * missing-task backfill. `singlePass` swaps step 4 between the window
    * formulation and the PbRecordAgg typed partial aggregate.
    */
  private def pbReport(s: SparkSession, dir: String, singlePass: Boolean): DataFrame = {
    import graft.reports._
    val cents = (round(col("value") * 100, 0).cast("long") + 100L)
    val bc = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("raw_log_id"),
        col("ts").as("Timestamp"),
        lit("Personal Best").as("Broadcast_Type"),
        format_string("user_%d", col("user_id")).as("Username"),
        // Mixed casing (decoupled from the task number) exercises the
        // case-insensitive canonicalization: config spelling wins where
        // a historical record exists, first-seen spelling elsewhere.
        when(pmod(expr("event_id div 10"), lit(2)) === 0,
          format_string("Task_%d", pmod(col("event_id"), lit(10))))
          .otherwise(format_string("task_%d", pmod(col("event_id"), lit(10))))
          .as("Task_Name"),
        format_string("%d:%02d.%02d",
          (cents / 6000L).cast("long"),
          (pmod(cents, lit(6000L)) / 100L).cast("long"),
          pmod(cents, lit(100L))).as("PB_Time"))
    val hist = PbHistoricalData(
      records = Seq(
        HistoricalPbRecord("G1", "Task_1", "0:00", Seq("Alice", "Bob"), None),
        HistoricalPbRecord("G1", "Task_99", "1:30.00", Seq("Carol"), Some("2023-05-01")),
        HistoricalPbRecord("G2", "Task_2", "0:01.00", Seq("Dave"), None),
        HistoricalPbRecord("G2", "Task_77", "2:00.00", Seq("Eve"), Some("2023-06-01"))),
      blacklist = Seq(PbBlacklistRule("Eve", None, None)),
      otherGroupName = "Misc PBs")
    val pbDef = PersonalBestsDef(
      similarityThresholdSeconds = 0.6,
      groupingWindowSeconds = 3600,
      allowMultipleHolders = true)
    PersonalBests.generate(bc, pbDef, hist, singlePass)
      .select(col("Task").as("task"), col("Holder").as("holder"),
        col("Time").as("pb_time"), col("Date").as("pb_date"),
        col("Group").as("grp"))
  }

  val queries: Map[String, Q] = Map(
    // A1+A2: leaderboard with per-period pivot columns, single shuffle.
    "q_period_pivot" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val periodAggs = periods.flatMap { case (name, start, end) =>
        val in = col("ts") >= lit(start) && col("ts") < lit(end)
        Seq(
          sum(when(in, 1L).otherwise(0L)).as(s"count_$name"),
          dbl(sum(when(in, dec(col("value"))).otherwise(dec(lit(0))))).as(s"value_$name"))
      }
      val aggs = Seq(
        count(lit(1)).as("count_all_time"),
        dbl(sum(dec(col("value")))).as("value_all_time")) ++ periodAggs
      ev.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    }),

    // P17+P18+P16-shape: type + time-range filter, detail sort order check
    // via deterministic projection (W1 detail tables are sorted at the
    // presentation edge; hash compare is order-insensitive so we emit keys).
    "q_detail_filter" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "signup")
          && col("ts") >= lit("2024-01-08") && col("ts") < lit("2024-01-22"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          dbl(col("value")).as("value"))
    }),

    // P19: exclusion windows.
    "q_exclusion_windows" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(!exclusionPredicate(col("ts"), col("event_type")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), dbl(sum(dec(col("value")))).as("sum_value"))
    }),

    // W2: grouped top-N (recent achievements shape), deterministic tie-break.
    "q_topn_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts").desc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("event_type"), col("rn"), col("event_id"), col("user_id"),
          dbl(col("value")).as("value"))
    }),

    // W6: keep-first dedup per (user, type) — deterministic window form.
    "q_dedup_keepfirst" -> ((s, dir) => {
      Dedup.keepFirst(Tables.events(s, dir), Seq("user_id", "event_type"),
        Seq(col("ts").asc, col("event_id").asc))
        .select(col("user_id"), col("event_type"), col("event_id"),
          dbl(col("value")).as("value"))
    }),

    // T1+W5: daily tumbling buckets with gap-free cumulative counts.
    "q_daily_cumulative" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      TimeSeries.resample(ev, "ts", "value", 86400L, "D")
        .select(date_format(col("Date"), "yyyy-MM-dd").as("date"), col("Count").as("n_rows"),
          dbl(col("Total_Value")).as("total_value"),
          col("Cumulative_Count").as("cum_rows"),
          dbl(col("Cumulative_Value")).as("cum_value"),
          col("Frequency").as("frequency"))
    }),

    // PSI drift monitor: value distribution of the first half-month vs
    // the rest, 10 reference-defined equal-width bins — integer counts +
    // one deterministically-derived smoothed term per bin.
    "q_psi_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = to_timestamp(lit("2024-01-16"))
      graft.ops.Drift.psiBins(ev.filter(col("ts") < cut),
        ev.filter(col("ts") >= cut), "value", nBins = 10)
    }),

    // Categorical twin over event_type shares, same smoothing contract.
    "q_drift_categorical" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = to_timestamp(lit("2024-01-16"))
      graft.ops.Drift.categorical(ev.filter(col("ts") < cut),
        ev.filter(col("ts") >= cut), "event_type")
    }),

    // Lag-1/2/3 autocovariance of the daily count series per event type —
    // one window pass + one (type, lag)-keyed agg, integer-exact numerators.
    "q_autocorr" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("c"))
      TimeSeries.lagCovariance(daily, "event_type", "day", "c", Seq(1, 2, 3))
    }),

    // T1 6h buckets across all types (stacked-frequency shape trimmed to 6h).
    "q_6h_buckets" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(TimeSeries.bucket(col("ts"), 21600L).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n_rows"))
        .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("event_type"), col("n_rows"))
    }),

    // EWMA-smoothed daily event counts per type (α=1/8) in integer
    // fixed-point — a sequential recurrence made engine-exact, one
    // sorted-group pass per series.
    "q_ewma" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("ts").cast("long") / 86400).cast("long").as("t"))
        .agg(count(lit(1)).as("v"))
      TimeSeries.ewmaFixedPoint(daily, "event_type", "t", "v", 1L, 8L)
        .select(col("event_type"),
          date_format(timestamp_seconds(col("t") * 86400), "yyyy-MM-dd").as("date"),
          col("ewma_fp"))
    }),

    // Holt linear-trend smoothing of daily counts (α=1/4, β=1/5) with a
    // 7-day-ahead forecast — the same integer fixed-point contract as
    // q_ewma, but with a trend state that goes negative on falling
    // series, pinning the truncating-division cross-engine semantics.
    "q_holt" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("ts").cast("long") / 86400).cast("long").as("t"))
        .agg(count(lit(1)).as("v"))
      TimeSeries.holtFixedPoint(daily, "event_type", "t", "v",
        alphaNum = 1L, alphaDen = 4L, betaNum = 1L, betaDen = 5L,
        horizon = 7L)
        .select(col("event_type"),
          date_format(timestamp_seconds(col("t") * 86400), "yyyy-MM-dd").as("date"),
          col("level_fp"), col("trend_fp"), col("forecast_fp"))
    }),

    // A/B experiment readout: unit = user (events pre-aggregated to one
    // row per user), treatment = odd user_id, conversion = any purchase.
    // One partial-agg'd pass; the derived lift/z/χ² are fixed-order IEEE
    // expressions over exact counts, rounded 6 — hash-stable cross-engine.
    "q_ab_test" -> ((s, dir) => {
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      graft.ops.Experiment.abTest(units,
        pmod(col("user_id"), lit(2)) === 1, col("conv") === 1L)
    }),

    // Poisson-bootstrap 95% CI on the conversion lift: every unit draws a
    // deterministic md5-seeded Poisson(1) multiplicity per replicate, all
    // 200 resamples aggregate in ONE pass (the shuffle carries 200×4
    // BIGINT cells), CI bounds are order statistics of the replicate
    // lifts — the only bootstrap shape that works at 100 TB, and the
    // md5 seeding is what makes a resampling procedure oracle-gateable.
    "q_bootstrap_ci" -> ((s, dir) => {
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      graft.ops.Experiment.poissonBootstrapCI(units, col("user_id"),
        pmod(col("user_id"), lit(2)) === 1, col("conv") === 1L,
        replicates = 200, alpha = 0.025)
    }),

    // Uplift (Qini) curve table: pre-period activity as the targeting
    // score, post-period purchase as the response — cumulative per-arm
    // counts at every distinct score threshold, all BIGINT.
    "q_qini" -> ((s, dir) => {
      val split = lit("2024-01-15").cast("timestamp")
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < split, 1L).otherwise(0L)).as("pre_cnt"),
          max(when(col("event_type") === "purchase" && col("ts") >= split,
            1L).otherwise(0L)).as("conv"))
      graft.ops.Experiment.upliftCurve(units, col("pre_cnt"),
        pmod(col("user_id"), lit(2)) === 1, col("conv") === 1L)
    }),

    // Exact two-sample KS statistic: is the purchase value distribution
    // shaped like the view value distribution? All-BIGINT common-
    // denominator form (D = ks_num/(n_a·n_b)), range-tiled cumulative
    // legs — the whole-shape drift test PSI's fixed bins can miss.
    "q_ks_test" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "view"))
      graft.ops.Drift.ksStatistic(ev, col("value"),
        col("event_type") === "purchase")
    }),

    // Wasserstein-1 distance on the cents grid between the same two
    // slices — KS says how far apart at the worst point, W1 says how
    // much mass moved how far; both pure-BIGINT exact.
    "q_wasserstein" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "view"))
      graft.ops.Drift.wasserstein1(ev, round(col("value") * 100),
        col("event_type") === "purchase")
    }),

    // Kaplan–Meier churn curve: per-user tenure in days (first→last
    // event), right-censored when the user was still active within 2
    // days of the observation edge — the estimator that doesn't count
    // still-alive users as churned.
    "q_survival" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val u = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("f"), max(col("ts")).as("l"))
      val m = ev.agg(max(col("ts")).as("mx"))
      val subjects = u.crossJoin(broadcast(m))
        .select(
          floor((unix_micros(col("l")) - unix_micros(col("f")))
            / lit(86400000000L)).cast("long").as("dur"),
          (unix_micros(col("l")) < unix_micros(col("mx")) - lit(172800000000L))
            .as("obs"))
      graft.ops.Experiment.kaplanMeier(subjects, col("dur"), col("obs"))
    }),

    // Same estimator at HOUR grain: the day-grain fixture collapses to a
    // single death time (one curve row), so this is the query that
    // actually hash-pins the full tiled risk-set/survival cumulatives
    // (hundreds of death times through Eval.tileOf/cumLegs) — the r13
    // re-tiling's dedicated gate.
    "q_survival_hours" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val u = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("f"), max(col("ts")).as("l"))
      val m = ev.agg(max(col("ts")).as("mx"))
      val subjects = u.crossJoin(broadcast(m))
        .select(
          floor((unix_micros(col("l")) - unix_micros(col("f")))
            / lit(3600000000L)).cast("long").as("dur"),
          // 0.3-day censor horizon: the fixture's inter-event gaps are
          // tiny (median ~0.3 d), so the day-grain query's 2-day window
          // censors all but one user — this grain needs a horizon that
          // actually lets deaths happen for the curve to have rows.
          (unix_micros(col("l")) < unix_micros(col("mx")) - lit(25920000000L))
            .as("obs"))
      graft.ops.Experiment.kaplanMeier(subjects, col("dur"), col("obs"))
    }),

    // Post-stratified lift: activity strata (event-count buckets) as the
    // categorical covariate; per-stratum weighted terms quantized to a
    // 1e-9 grid before the cross-strata BIGINT sum.
    "q_post_strat" -> ((s, dir) => {
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"),
          (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("y"))
        .select(col("user_id"),
          least(floor(col("cnt") / lit(5)).cast("long"), lit(8L)).as("s"),
          col("y"))
      graft.ops.Experiment.postStratifiedLift(units,
        pmod(col("user_id"), lit(2)) === 1, col("s"), col("y"))
    }),

    // Difference-in-differences over the pre/post Jan-15 split: each
    // (user, period) revenue observation fills the 2x2; the estimate is
    // one fixed-order double over eight BIGINT sums.
    "q_did" -> ((s, dir) => {
      val obs = Tables.events(s, dir)
        .groupBy(col("user_id"),
          (col("ts") >= lit("2024-01-15").cast("timestamp")).as("post"))
        .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
          .as("y"))
      graft.ops.Experiment.diffInDiff(obs,
        pmod(col("user_id"), lit(2)) === 1, col("post"), col("y"))
    }),

    // Always-valid sequential readout: per-user units attributed to their
    // first-seen day, cumulative mixture-SPRT log-likelihood and the
    // running-min always-valid p per day — the peek-every-day monitor.
    "q_msprt" -> ((s, dir) => {
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(floor(min(col("ts")).cast("long") / 21600).cast("long").as("day"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      graft.ops.Experiment.msprt(units,
        pmod(col("user_id"), lit(2)) === 1, col("conv") === 1L,
        col("day"), tau2 = 1e-4)
        .select(
          date_format(timestamp_seconds(col("day") * 21600),
            "yyyy-MM-dd HH:mm").as("date"),
          col("n_c"), col("n_t"), col("conv_c"), col("conv_t"),
          col("log_lambda"), col("p_av"))
    }),

    // CUPED-adjusted lift: pre-period (before Jan 15) per-user revenue as
    // the covariate, post-period revenue as the metric, both quantized to
    // integer cents so every sufficient statistic is BIGINT-exact; θ,
    // lifts, and ρ² are fixed-order doubles rounded 6.
    "q_cuped" -> ((s, dir) => {
      val split = lit("2024-01-15").cast("timestamp")
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          (sum(when(col("ts") < split, dec(col("value")))
            .otherwise(dec(lit(0)))) * 100).cast("long").as("x"),
          (sum(when(col("ts") >= split, dec(col("value")))
            .otherwise(dec(lit(0)))) * 100).cast("long").as("y"))
      graft.ops.Experiment.cuped(units,
        pmod(col("user_id"), lit(2)) === 1, col("x"), col("y"))
    }),

    // Mann–Whitney rank-sum readout on a continuous metric (per-user
    // revenue): U rides the range-tiled AUC rank machinery (no global
    // sort); the metric is a DECIMAL-exact sum cast to double so both
    // engines rank identical values. Tie-corrected z, rounded 6.
    "q_rank_sum" -> ((s, dir) => {
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("m"))
        .select(col("user_id"), col("m").cast("double").as("m"))
      graft.ops.Experiment.rankSum(units,
        pmod(col("user_id"), lit(2)) === 1, col("m"))
    }),

    // CUSUM level-shift monitor over daily counts: both one-sided Page
    // statistics in exact integers via the cumsum-minus-running-extremum
    // closed form — two window frames, one series-keyed sort, no
    // sequential state.
    "q_cusum" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("ts").cast("long") / 86400).cast("long").as("t"))
        .agg(count(lit(1)).as("v"))
      TimeSeries.cusum(daily, "event_type", "t", "v",
        target = 30L, threshold = 50L)
        .select(col("event_type"),
          date_format(timestamp_seconds(col("t") * 86400), "yyyy-MM-dd").as("date"),
          col("cusum_high"), col("cusum_low"), col("alarm"))
    }),

    // Offline change-point detection: depth-2 binary segmentation with
    // the CUSUM mean-shift statistic over per-type daily counts — the
    // batch complement of q_cusum's sequential monitor. EXACT integers
    // end to end (the deviation is |n·cum − t·total|, scaled by n
    // instead of divided), so the (dev DESC, day ASC) argmax is
    // engine-exact with no float tie risk.
    "q_changepoint" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("ts").cast("long") / 86400).cast("long").as("day"))
        .agg(count(lit(1)).as("y"))
      graft.ops.TimeSeries.changePoints(daily, "event_type", "day", "y",
        depth = 2, minSeg = 3)
        .select(col("event_type"), col("depth"), col("day"), col("dev"))
    }),

    // Theil–Sen robust trend per type: median of pairwise slopes over the
    // same daily counts — the outlier-immune counterpart of
    // q_group_trend's OLS (one spiky day drags OLS, barely moves the
    // median). Pairs are O(days²) per series; the per-key daily
    // aggregate keeps that bounded at any corpus scale.
    "q_theilsen" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          (floor(col("ts").cast("long") / 86400) - lit(19723L)).as("day"))
        .agg(count(lit(1)).as("y"))
      graft.ops.TimeSeries.theilSen(daily, "event_type", "day", "y")
        .select(col("event_type"), col("n"),
          (round(col("slope"), 6) + lit(0.0)).as("slope"),
          (round(col("intercept"), 4) + lit(0.0)).as("intercept"))
    }),

    // Per-type value trend: OLS slope/intercept over days-since-epoch in
    // closed form — five exact integer sums per group, float only in the
    // final two divisions.
    "q_group_trend" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          (floor(col("ts").cast("long") / 86400) - lit(19723L)).as("day"),
          col("value"))
      graft.ops.Regression.groupTrend(ev, Seq("event_type"), "day", "value")
        .select(col("event_type"), col("n"),
          (round(col("slope"), 6) + lit(0.0)).as("slope"),
          (round(col("intercept"), 4) + lit(0.0)).as("intercept"))
    }),

    // W3: derived categories unioned with source (U1).
    "q_derived_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val derived = ev.filter(col("event_type") === "purchase" && col("value") > 150.0)
        .withColumn("event_type", lit("big_purchase"))
      ev.unionByName(derived)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_rows"))
    }),

    // J5: temporal key remap — later rule wins, range-bounded.
    "q_temporal_remap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // rules: (rule_idx, source_id, target_id, start, end) — config-sized,
      // broadcast; later rule (higher idx) wins on overlap.
      val rules = Seq(
        (0, 3L, 100L, "2024-01-01", "2024-01-20"),
        (1, 3L, 200L, "2024-01-10", "2024-01-25"), // overlaps rule 0; wins in [10,20)
        (2, 7L, 300L, "2024-01-01", "2024-02-01"))
      val rulesDf = s.createDataFrame(rules)
        .toDF("rule_idx", "source_id", "target_id", "start_s", "end_s")
        .select(col("rule_idx"), col("source_id"), col("target_id"),
          to_timestamp(col("start_s")).as("start_ts"), to_timestamp(col("end_s")).as("end_ts"))
      val joined = ev.join(broadcast(rulesDf),
        col("user_id") === col("source_id") &&
          col("ts") >= col("start_ts") && col("ts") < col("end_ts"), "left")
      val w = Window.partitionBy(col("event_id")).orderBy(col("rule_idx").desc_nulls_last)
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"),
          coalesce(col("target_id"), col("user_id")).as("user_id"),
          col("event_type"))
    }),

    // T6/A5-shape: per-key record reduction — min value, rows within a
    // tolerance of the min, a grouping window anchored at the earliest
    // qualifying row, holders collected (the personal-best report shape).
    // Values are compared in integer cents so the tolerance boundary is
    // exact on both engines.
    "q_record_reduction" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "error")
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val byUser = Window.partitionBy(col("user_id"))
      val withMin = ev.withColumn("min_c", min(col("cents")).over(byUser))
        .filter(col("cents") <= col("min_c") + lit(100L))
      val firstTs = withMin.withColumn("first_ts", min(col("ts")).over(byUser))
        .filter(col("ts") <= col("first_ts") + expr("INTERVAL 3600 SECONDS"))
      firstTs.groupBy(col("user_id"))
        .agg(min(col("cents")).as("record_cents"),
          count(lit(1)).as("n_holders"),
          array_join(array_sort(collect_set(col("event_id").cast("string"))), ",")
            .as("holder_ids"))
    }),

    // A3/J2/J3 composite: the REAL collection-log generator end-to-end —
    // type filter, flat exclusion, keep-first dedup for the dedup type
    // only (on the RAW item string, pre-quantity-parse), "N x Item"
    // parse, per-period quantity sums, historical initial counts folded
    // into All_Time, group structure with catch-all routing.
    "q_clog_report" -> ((s, dir) => {
      import java.sql.Timestamp
      import graft.reports._
      val bc = Tables.events(s, dir).select(
        col("event_id").as("raw_log_id"),
        col("ts").as("Timestamp"),
        when(col("event_type") === "purchase", "Collection Log")
          .when(col("event_type") === "view", "Valuable Drop")
          .otherwise("Other").as("Broadcast_Type"),
        format_string("user_%d", col("user_id")).as("Username"),
        when(pmod(col("event_id"), lit(7)) === 0,
          format_string("%d x Item_%d",
            pmod(col("event_id"), lit(5)) + 2, pmod(col("event_id"), lit(20))))
          .otherwise(format_string("Item_%d", pmod(col("event_id"), lit(20))))
          .as("Item_Name"))
      val clogDef = CollectionLogDef(
        Seq("Collection Log", "Valuable Drop"), Some("Collection Log"))
      val hist = ClogHistoricalData(
        groups = Seq(
          ("Bosses", Seq("Item_1", "Item_2", "Item_3")),
          ("Skilling", Seq("Item_4", "Item_2"))),
        initialCounts = Map("Item_1" -> 10L, "Item_99" -> 5L),
        excludeRules = Seq(Seq("Item_5")),
        otherGroupName = "Other Items")
      val periods = Seq(
        Period("All_Time", None, Timestamp.valueOf("2024-02-01 00:00:00"), "All-Time"),
        Period("JanH1", Some(Timestamp.valueOf("2024-01-01 00:00:00")),
          Timestamp.valueOf("2024-01-15 00:00:00"), "Jan H1"))
      CollectionLog.generate(bc, clogDef, hist, periods)
        .select(col("Group").as("grp"), col("Item_Name").as("item_name"),
          col("All_Time_Count").as("all_time"), col("JanH1_Count").as("jan_h1"))
    }),

    // A5/A6/J8/P22 composite: the REAL personal-bests generator — the
    // "0:00" → ∞ historical sentinel, similarity-threshold record
    // groups, grouping-window achievers vs later holders, historical
    // holder lists via min_by, manual vs derived dates, a global
    // blacklist scrub, and the missing-task backfill.
    "q_pb_report" -> (pbReport(_, _, singlePass = false)),

    // Same report through the single-pass PbRecordAgg (typed partial
    // aggregate, no per-task sort) — same DuckDB oracle must hash-match.
    "q_pb_singlepass" -> (pbReport(_, _, singlePass = true)),

    // W2/W3/W4 composite: the REAL recent-achievements generator —
    // derived categories (Maxed Skill 99 / Maxed Combat) unioned in, then
    // deterministic top-N per type (ts desc, id asc).
    "q_recent_achievements" -> ((s, dir) => {
      import graft.reports._
      val bc = Tables.events(s, dir).select(
        col("event_id").as("raw_log_id"),
        col("ts").as("Timestamp"),
        when(col("event_type") === "purchase", "Level Up")
          .when(col("event_type") === "click", "Quest")
          .when(col("event_type") === "signup", "Pet")
          .otherwise("Other").as("Broadcast_Type"),
        format_string("user_%d", col("user_id")).as("Username"),
        when(pmod(col("event_id"), lit(4)) === 0, "Combat")
          .otherwise("Attack").as("Skill"),
        when(pmod(col("event_id"), lit(17)) === 0, lit(null).cast("int"))
          .when(pmod(col("event_id"), lit(10)) === 0, lit(99))
          .when(pmod(col("event_id"), lit(10)) === 1 && pmod(col("event_id"), lit(4)) === 0, lit(126))
          .otherwise(pmod(col("event_id"), lit(99)).cast("int")).as("New_Level"))
      Reports.recentAchievements(bc,
        RecentAchievementsDef(Seq("Level Up", "Quest", "Pet"), 15))
        .select(col("Broadcast_Type").as("broadcast_type"),
          col("raw_log_id"), col("Username").as("username"),
          date_format(col("Timestamp"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
    }),

    // T1 composite: the REAL timeseries report generator across all three
    // frequencies — 6h/D epoch-aligned buckets, pandas week-ending-SUNDAY
    // labels (Monday trunc + 6 days), gap-free spines, cumulative sums,
    // null Item_Value coalesced before the agg.
    "q_timeseries_report" -> ((s, dir) => {
      import graft.reports._
      val bc = Tables.events(s, dir).select(
        col("ts").as("Timestamp"),
        when(col("event_type") === "purchase", "Valuable Drop")
          .otherwise("Other").as("Broadcast_Type"),
        format_string("user_%d", col("user_id")).as("Username"),
        when(pmod(col("event_id"), lit(13)) === 0, lit(null).cast("long"))
          .otherwise(round(col("value") * 100, 0).cast("long")).as("Item_Value"))
      Reports.timeseries(bc, TimeseriesReportDef("t", Seq("Valuable Drop")))
        .select(date_format(col("Date"), "yyyy-MM-dd HH:mm:ss").as("date_str"),
          col("Count").as("n"), col("Total_Value").as("total_value"),
          col("Cumulative_Count").as("cum_n"),
          col("Cumulative_Value").as("cum_value"),
          col("Frequency").as("freq"))
    }),

    // W1/P17/P18 composite: the REAL detailed-report generator — type
    // filter, Item_Value null→0, per-period slice (the Timestamp-desc
    // presentation sort is invisible to the row-hash gate by design).
    "q_detailed_report" -> ((s, dir) => {
      import java.sql.Timestamp
      import graft.reports._
      val bc = Tables.events(s, dir).select(
        col("event_id").as("raw_log_id"),
        col("ts").as("Timestamp"),
        when(col("event_type") === "purchase", "Valuable Drop")
          .when(col("event_type") === "view", "PvP Kill")
          .otherwise("Other").as("Broadcast_Type"),
        format_string("user_%d", col("user_id")).as("Username"),
        when(pmod(col("event_id"), lit(11)) === 0, lit(null).cast("long"))
          .otherwise(round(col("value") * 100, 0).cast("long")).as("Item_Value"))
      val periods = Seq(Period("JanH1",
        Some(Timestamp.valueOf("2024-01-01 00:00:00")),
        Timestamp.valueOf("2024-01-15 00:00:00"), "Jan H1"))
      Reports.detailed(bc,
        DetailedReportDef("drops", Seq("Valuable Drop", "PvP Kill")),
        periods)("drops_janh1")
        .select(col("raw_log_id"), col("Broadcast_Type").as("broadcast_type"),
          col("Username").as("username"), col("Item_Value").as("item_value"))
    }),

    // Interval×interval overlap join, user-blocked, on the integer-µs
    // axis (both engines floor ns→µs identically, so touch boundaries
    // agree exactly): view-windows × click-windows within 10 minutes.
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def side(t: String, p: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("event_id").as(s"${p}_id"),
          unix_micros(col("ts")).as(s"${p}_start"),
          (unix_micros(col("ts")) + lit(600000000L)).as(s"${p}_end"))
      graft.ops.RangeJoin.intervalOverlap(
        side("view", "l"), side("click", "r"),
        "l_start", "l_end", "r_start", "r_end",
        binWidth = 600000000L, keyCols = Seq("user_id"))
        .select(col("user_id"), col("l_id"), col("r_id"))
    }),

    // Cohort retention on integer epoch-week indices (see ops.Retention).
    "q_retention" -> ((s, dir) => {
      graft.ops.Retention.cohorts(Tables.events(s, dir), "user_id", "ts")
    }),

    // Ordered funnel: view → click → purchase per user, one shuffle + one
    // sort, stages as layered same-spec windows (see ops.Funnel).
    "q_funnel" -> ((s, dir) => {
      graft.ops.Funnel.steps(Tables.events(s, dir), "user_id", "ts",
        tieCols = Seq("event_id"),
        stages = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"))
    }),

    // Markov transition matrix (ops.Transitions): which event type
    // follows which, per user, with a 1-hour gap break — sankey edges +
    // next-step probabilities from one lag window and one partial-agg'd
    // count; the per-source normalizer broadcasts.
    "q_event_transitions" -> ((s, dir) => {
      graft.ops.Transitions.matrix(Tables.events(s, dir), "user_id", "ts",
        "event_type", tieCols = Seq("event_id"), gapSeconds = Some(3600L))
    }),

    // First/last-touch attribution (ops.Attribution): purchases credit
    // view/click touches within a 3-day lookback; a user-keyed range
    // join + one struct-min/max reduction per conversion. 'none' rows
    // keep the report reconciling against the raw conversion count.
    "q_attribution" -> ((s, dir) => {
      graft.ops.Attribution.report(Tables.events(s, dir), "user_id", "ts",
        "event_type", "event_id",
        isConversion = col("event_type") === "purchase",
        isTouch = col("event_type").isin("view", "click"),
        lookbackSeconds = 259200L)
    }),

    // T-sessionize: gap-based sessions (30 min), session stats per user.
    "q_sessionize" -> ((s, dir) => {
      val sess = TimeSeries.sessionize(Tables.events(s, dir), "user_id", "ts", 1800L)
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), dec(sum(dec(col("value")))).as("sum_value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          dbl(max(col("sum_value"))).as("max_session_value"))
    }),

    // SCD-2 dimension build: collapse each user's event_type change log
    // into validity intervals (see graft.ops.Scd2). The J5 temporal-remap
    // shape generalized — this is how entity metadata gets versioned so
    // facts can as-of join against it.
    "q_scd2" -> ((s, dir) => {
      graft.ops.Scd2.fromChangeLog(
        Tables.events(s, dir).select("user_id", "event_type", "ts", "event_id"),
        keys = Seq("user_id"), attrs = Seq("event_type"),
        tsCol = "ts", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current"))
    }),

    // Linear gap-fill: a sparse daily metric (every third day kept)
    // interpolated over its full date spine. Runs through the CHUNKED
    // formulation (week chunks at sf0.01 → the cross-chunk carry path is
    // exercised under this oracle, which is the global-window form —
    // bit-identical by construction, see TimeSeries.interpolateLinear).
    // Observations are rounded to 4 decimals BEFORE interpolation so both
    // engines interpolate from bit-identical doubles.
    "q_interpolate" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(round(avg(col("value")), 4).as("v"))
      val sparse = daily.filter(pmod(dayofmonth(col("d")), lit(3)) === 1)
      TimeSeries.interpolateLinear(sparse, "d", "v",
        TimeSeries.weekChunk(col("d")))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          round(col("v"), 4).as("v"), col("interpolated"))
    }),

    // Trailing 7-day moving average via the scatter-and-regroup shape
    // (TimeSeries.trailingWindow) — no ordered window anywhere. Daily
    // values go through decimal(18,4) so the window sums are exact on
    // both engines; the final average divides in float64.
    "q_moving_avg" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "view")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(round(avg(col("value")), 4).cast("decimal(18,4)").as("v"))
      TimeSeries.trailingWindow(daily, "d", "v", 7)
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          col("w_days"),
          round(col("w_sum").cast("double") / col("w_days"), 4).as("ma7"))
    }))

  private val exclusionSql: String =
    exclusionRules.map { case (s, e, types) =>
      val base = s"(ts >= TIMESTAMP '$s' AND ts < TIMESTAMP '$e'"
      if (types.isEmpty) base + ")"
      else base + s" AND event_type IN (${types.map(t => s"'$t'").mkString(",")}))"
    }.mkString(" OR ")

  private val periodPivotCols: String = periods.map { case (name, st, en) =>
    s"""  count(*) FILTER (WHERE ts >= TIMESTAMP '$st' AND ts < TIMESTAMP '$en') AS count_$name,
       |  CAST(CAST(COALESCE(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE ts >= TIMESTAMP '$st' AND ts < TIMESTAMP '$en'), 0) AS DECIMAL(18,2)) AS DOUBLE) AS value_$name""".stripMargin
  }.mkString(",\n")

  /** Shared DuckDB oracle for q_pb_report and q_pb_singlepass. */
  private val pbOracle: String =
    """WITH db AS (
        |  SELECT event_id AS raw_log_id, ts, 'user_' || user_id AS username,
        |    CASE WHEN (event_id // 10) % 2 = 0 THEN 'Task_' || (event_id % 10)
        |         ELSE 'task_' || (event_id % 10) END AS task,
        |    printf('%d:%02d.%02d', c // 6000, (c % 6000) // 100, c % 100) AS pb_time,
        |    FALSE AS is_hist, CAST(NULL AS BIGINT) AS cfg,
        |    CAST(NULL AS VARCHAR) AS mdate, CAST(NULL AS VARCHAR[]) AS all_holders
        |  FROM (SELECT *, CAST(round(value * 100, 0) AS BIGINT) + 100 AS c
        |        FROM events WHERE event_type = 'purchase')),
        |hist(task, pb_time, username, all_holders, mdate, cfg) AS (VALUES
        |  ('Task_1', '0:00', 'Alice', ['Alice','Bob'], NULL, 0),
        |  ('Task_99', '1:30.00', 'Carol', ['Carol'], '2023-05-01', 1),
        |  ('Task_2', '0:01.00', 'Dave', ['Dave'], NULL, 2),
        |  ('Task_77', '2:00.00', 'Eve', ['Eve'], '2023-06-01', 3)),
        |histu AS (
        |  SELECT CAST(NULL AS BIGINT) AS raw_log_id,
        |    COALESCE(CAST(mdate AS TIMESTAMP), TIMESTAMP '0001-01-01') AS ts,
        |    username, task, pb_time, TRUE AS is_hist, CAST(cfg AS BIGINT) AS cfg,
        |    mdate, all_holders
        |  FROM hist),
        |allr AS (
        |  SELECT raw_log_id, ts, username, task, pb_time, is_hist, cfg, mdate, all_holders FROM db
        |  UNION ALL
        |  SELECT raw_log_id, ts, username, task, pb_time, is_hist, cfg, mdate, all_holders FROM histu),
        |canon AS (
        |  SELECT lower_t, canon_t FROM (
        |    SELECT lower(task) AS lower_t, task AS canon_t,
        |      row_number() OVER (PARTITION BY lower(task)
        |        ORDER BY CASE WHEN is_hist THEN 0 ELSE 1 END,
        |                 CASE WHEN is_hist THEN -cfg ELSE 0 END,
        |                 ts, raw_log_id ASC NULLS LAST) AS rn
        |    FROM allr WHERE task IS NOT NULL) WHERE rn = 1),
        |canonical AS (
        |  SELECT a.raw_log_id, a.ts, a.username,
        |    COALESCE(c.canon_t, a.task) AS task,
        |    a.pb_time, a.is_hist, a.cfg, a.mdate, a.all_holders
        |  FROM allr a LEFT JOIN canon c ON lower(a.task) = c.lower_t),
        |scrub AS (
        |  SELECT raw_log_id, ts, username, task, pb_time, is_hist, cfg, mdate,
        |    CASE WHEN all_holders IS NOT NULL
        |      THEN list_filter(all_holders, h -> h <> 'Eve') ELSE all_holders END AS all_holders
        |  FROM canonical WHERE username <> 'Eve'),
        |sec AS (
        |  SELECT *, CASE WHEN is_hist AND pb_time = '0:00' THEN CAST('infinity' AS DOUBLE)
        |    ELSE CAST(string_split(pb_time, ':')[1] AS BIGINT) * 60
        |      + CAST(string_split(pb_time, ':')[2] AS DOUBLE) END AS s
        |  FROM scrub WHERE task IS NOT NULL),
        |m AS (SELECT *, min(s) OVER (PARTITION BY task) AS ms FROM sec),
        |kept AS (SELECT * FROM m
        |  WHERE ms = CAST('infinity' AS DOUBLE) OR abs(s - ms) <= 0.6),
        |rn AS (
        |  SELECT *, row_number() OVER (PARTITION BY task
        |      ORDER BY ts, is_hist DESC, cfg ASC NULLS LAST, raw_log_id ASC NULLS LAST) AS r,
        |    min(ts) OVER (PARTITION BY task) AS first_ts
        |  FROM kept),
        |ach AS (
        |  SELECT *, ts <= first_ts + INTERVAL 3600 SECONDS AS achiever,
        |    CASE WHEN NOT is_hist THEN strftime(ts, '%Y-%m-%d')
        |         WHEN mdate IS NOT NULL AND mdate <> '' THEN mdate END AS date_str
        |  FROM rn),
        |red AS (
        |  SELECT task,
        |    max(CASE WHEN r = 1 THEN pb_time END) AS time,
        |    max(CASE WHEN r = 1 THEN date_str END) AS dt,
        |    min_by(all_holders, r) FILTER (WHERE is_hist AND achiever) AS hist_holders,
        |    list(username) FILTER (WHERE NOT is_hist AND achiever) AS db_holders,
        |    list(username) FILTER (WHERE NOT achiever) AS later_holders
        |  FROM ach GROUP BY task),
        |sel AS (
        |  SELECT task, time, dt,
        |    array_to_string(list_sort(list_distinct(list_filter(
        |      list_concat(list_concat(
        |        COALESCE(hist_holders, []), COALESCE(db_holders, [])),
        |        COALESCE(later_holders, [])),
        |      h -> h IS NOT NULL AND h <> ''))), ', ') AS holder
        |  FROM red),
        |grpmap(task, g) AS (VALUES ('Task_1', 'G1'), ('Task_99', 'G1'),
        |  ('Task_2', 'G2'), ('Task_77', 'G2')),
        |summary AS (
        |  SELECT s.task, s.holder, s.time, s.dt, COALESCE(gm.g, 'Misc PBs') AS grp
        |  FROM sel s LEFT JOIN grpmap gm ON s.task = gm.task),
        |missing AS (
        |  SELECT h.task, '' AS holder, '0:00' AS time,
        |    CAST(NULL AS VARCHAR) AS dt, COALESCE(gm.g, 'Misc PBs') AS grp
        |  FROM (SELECT DISTINCT task FROM hist) h
        |  LEFT JOIN grpmap gm ON h.task = gm.task
        |  WHERE h.task NOT IN (SELECT task FROM summary))
        |SELECT task, holder, time AS pb_time, dt AS pb_date, grp FROM summary
        |UNION ALL
        |SELECT task, holder, time AS pb_time, dt AS pb_date, grp FROM missing""".stripMargin

  val oracles: Map[String, String] = Map(
    // Two unrolled segmentation levels: rank + running sum per
    // (type, segment), integer deviation, row_number()=1 argmax with the
    // same (dev DESC, day ASC) tie-break. Segment LABELS differ from the
    // engine's (0/1 here vs 2·seg/2·seg+1) but the partitioning sets are
    // identical, which is all the windows see.
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |r1 AS (
        |  SELECT event_type, day, y,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS rn,
        |    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM daily),
        |s1 AS (SELECT event_type, day, abs(cum * n - rn * tot) AS dev
        |  FROM r1 WHERE rn >= 3 AND rn <= n - 3),
        |b1 AS (SELECT event_type, day, dev FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev DESC, day) AS rr FROM s1)
        |  WHERE rr = 1 AND dev > 0),
        |seg AS (SELECT d.event_type, d.day, d.y,
        |    CASE WHEN b1.day IS NOT NULL AND d.day > b1.day
        |      THEN 1 ELSE 0 END AS sg
        |  FROM daily d LEFT JOIN b1 ON d.event_type = b1.event_type),
        |r2 AS (
        |  SELECT event_type, sg, day, y,
        |    CAST(row_number() OVER (PARTITION BY event_type, sg
        |      ORDER BY day) AS BIGINT) AS rn,
        |    CAST(sum(y) OVER (PARTITION BY event_type, sg ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(count(*) OVER (PARTITION BY event_type, sg) AS BIGINT) AS n,
        |    CAST(sum(y) OVER (PARTITION BY event_type, sg) AS BIGINT) AS tot
        |  FROM seg),
        |s2 AS (SELECT event_type, sg, day, abs(cum * n - rn * tot) AS dev
        |  FROM r2 WHERE rn >= 3 AND rn <= n - 3),
        |b2 AS (SELECT event_type, day, dev FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type, sg
        |      ORDER BY dev DESC, day) AS rr FROM s2)
        |  WHERE rr = 1 AND dev > 0)
        |SELECT event_type, CAST(1 AS INT) AS depth, day, dev FROM b1
        |UNION ALL
        |SELECT event_type, CAST(2 AS INT) AS depth, day, dev FROM b2""".stripMargin,

    // Pairwise-slope median (quantile_cont ↔ Spark exact percentile, the
    // proven parity pair); slopes divide exact BIGINTs in double.
    "q_theilsen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) - 19723 AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    (b.y - a.y) / CAST(b.day - a.day AS DOUBLE) AS s
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |sl AS (SELECT event_type, quantile_cont(s, 0.5) AS slope
        |  FROM p GROUP BY 1),
        |i AS (SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |    min(sl.slope) AS slope,
        |    quantile_cont(d.y - sl.slope * d.day, 0.5) AS ic
        |  FROM daily d JOIN sl USING (event_type) GROUP BY 1)
        |SELECT event_type, n, round(slope, 6) + 0.0 AS slope,
        |  round(ic, 4) + 0.0 AS intercept
        |FROM i""".stripMargin,

    // Same sufficient statistics: HUGEINT-exact sums cast once, identical
    // final division trees.
    "q_group_trend" ->
      """WITH q AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) - 19723 AS x,
        |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM q GROUP BY 1)
        |SELECT event_type, n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6) + 0.0 AS slope,
        |  round((CAST(sy AS DOUBLE) / 100.0
        |    - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |      / 100.0 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) + 0.0 AS intercept
        |FROM a""".stripMargin,

    // The same integer recurrence as a recursive CTE: step t joins step
    // t-1 per series; all divisions are `//` on non-negative BIGINTs, so
    // DuckDB floor == Spark floorDiv bit-for-bit.
    "q_ewma" ->
      """WITH RECURSIVE b AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
        |    count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, t, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn
        |  FROM b),
        |r AS (
        |  SELECT event_type, t, rn, CAST(v * 1000000 AS BIGINT) AS ewma
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.t, s.rn,
        |    CAST((1 * s.v * 1000000 + 7 * r.ewma) // 8 AS BIGINT)
        |  FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT event_type,
        |  strftime(make_timestamp(t * 86400000000), '%Y-%m-%d') AS date,
        |  ewma AS ewma_fp
        |FROM r""".stripMargin,
    // Holt as a recursive CTE: both states step per series; every
    // division is DuckDB `//` on possibly-negative BIGINTs, which
    // truncates toward zero exactly like the engine's JVM long division.
    "q_holt" ->
      """WITH RECURSIVE b AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
        |    count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, t, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn
        |  FROM b),
        |r AS (
        |  SELECT event_type, t, rn,
        |    CAST(v * 1000000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS tr
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.t, s.rn,
        |    CAST((1 * s.v * 1000000 + 3 * (r.l + r.tr)) // 4 AS BIGINT),
        |    CAST((1 * ((1 * s.v * 1000000 + 3 * (r.l + r.tr)) // 4 - r.l)
        |      + 4 * r.tr) // 5 AS BIGINT)
        |  FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT event_type,
        |  strftime(make_timestamp(t * 86400000000), '%Y-%m-%d') AS date,
        |  l AS level_fp, tr AS trend_fp,
        |  CAST(l + 7 * tr AS BIGINT) AS forecast_fp
        |FROM r""".stripMargin,
    // Same unitization, same fixed-order arithmetic over the four exact
    // counts, same 6-decimal rounding grid (the repo-wide round(x, 6)
    // cross-engine pattern).
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE conv END) AS BIGINT) AS conv_c,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_t
        |  FROM u)
        |SELECT n_c, n_t, CAST(0 AS BIGINT) AS n_null, conv_c, conv_t,
        |  CASE WHEN n_c > 0 AND n_t > 0 THEN
        |    round(CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |      - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
        |  END AS lift,
        |  CASE WHEN n_c > 0 AND n_t > 0 AND conv_c + conv_t > 0
        |        AND conv_c + conv_t < n_c + n_t THEN
        |    round((CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |         - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE))
        |      / sqrt((CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
        |        * (1.0 - CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
        |        * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE))), 6)
        |  END AS z,
        |  CASE WHEN n_t + n_c > 0 THEN
        |    round(CAST(n_t - n_c AS DOUBLE) * CAST(n_t - n_c AS DOUBLE)
        |      / CAST(n_t + n_c AS DOUBLE), 6)
        |  END AS srm_chi2
        |FROM a""".stripMargin,

    // Same md5-seeded multiplicities, same Poisson CDF literals, same
    // order-statistic bounds — the full resample replayed in SQL.
    "q_bootstrap_ci" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |e AS (
        |  SELECT user_id, conv, b
        |  FROM u CROSS JOIN (SELECT unnest(range(200)) AS b)),
        |d AS (
        |  SELECT user_id % 2 = 1 AS t, conv, b,
        |    CAST(CAST(('0x' || substr(md5(
        |      CAST(user_id AS VARCHAR) || '|' || CAST(b AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE) AS u01
        |  FROM e),
        |mm AS (
        |  SELECT t, conv, b,
        |    CASE WHEN u01 < 0.36787944117144233 THEN 0
        |         WHEN u01 < 0.7357588823428847 THEN 1
        |         WHEN u01 < 0.9196986029286058 THEN 2
        |         WHEN u01 < 0.9810118431238463 THEN 3
        |         WHEN u01 < 0.9963401531726563 THEN 4
        |         WHEN u01 < 0.9994058151824183 THEN 5
        |         WHEN u01 < 0.999916758850712 THEN 6
        |         WHEN u01 < 0.9999897508033253 THEN 7
        |         ELSE 8 END AS m
        |  FROM d),
        |r AS (
        |  SELECT b,
        |    CAST(sum(CASE WHEN t THEN 0 ELSE m END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN t THEN m ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN NOT t AND conv = 1 THEN m ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN t AND conv = 1 THEN m ELSE 0 END) AS BIGINT) AS ct
        |  FROM mm GROUP BY b),
        |f AS (
        |  SELECT b, round(CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE)
        |    - CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE), 6) AS lift
        |  FROM r WHERE nc > 0 AND nt > 0),
        |rk AS (
        |  SELECT lift, row_number() OVER (ORDER BY lift, b) AS rn,
        |    count(*) OVER () AS n
        |  FROM f)
        |SELECT CAST(max(n) AS BIGINT) AS b_effective,
        |  min(lift) AS ci_lo, max(lift) AS ci_hi
        |FROM rk
        |WHERE rn = ceil(0.025 * n) OR rn = n - ceil(0.025 * n) + 1""".stripMargin,

    // Same distinct-score reduction, same descending cumulative legs.
    "q_qini" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pre_cnt,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT pre_cnt AS thr,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dnt,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS dnc,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS dct,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE conv END) AS BIGINT) AS dcc
        |  FROM u GROUP BY pre_cnt)
        |SELECT thr,
        |  CAST(sum(dnt) OVER w AS BIGINT) AS n_t,
        |  CAST(sum(dnc) OVER w AS BIGINT) AS n_c,
        |  CAST(sum(dct) OVER w AS BIGINT) AS conv_t,
        |  CAST(sum(dcc) OVER w AS BIGINT) AS conv_c
        |FROM g
        |WINDOW w AS (ORDER BY thr DESC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    // Same distinct-value reduction, same common-denominator CDF gap.
    "q_ks_test" ->
      """WITH t AS (
        |  SELECT value AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
        |  FROM events
        |  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
        |g AS (
        |  SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |    CAST(sum(1 - a) AS BIGINT) AS cb
        |  FROM t GROUP BY v),
        |c AS (
        |  SELECT
        |    CAST(sum(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_a,
        |    CAST(sum(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_b
        |  FROM g),
        |tot AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM g)
        |SELECT na AS n_a, nb AS n_b,
        |  CAST(max(abs(cum_a * nb - cum_b * na)) AS BIGINT) AS ks_num
        |FROM c, tot GROUP BY na, nb""".stripMargin,

    // Same cents grid, same gap-times-gap-width integer terms.
    "q_wasserstein" ->
      """WITH t AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
        |  FROM events
        |  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
        |g AS (
        |  SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |    CAST(sum(1 - a) AS BIGINT) AS cb
        |  FROM t GROUP BY v),
        |c AS (
        |  SELECT v,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
        |    CAST(sum(cb) OVER w AS BIGINT) AS cum_b,
        |    lead(v) OVER (ORDER BY v) AS nv
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM g)
        |SELECT na AS n_a, nb AS n_b,
        |  CAST(sum(abs(cum_a * nb - cum_b * na) * (coalesce(nv, v) - v))
        |    AS BIGINT) AS w1_num
        |FROM c, tot GROUP BY na, nb""".stripMargin,

    // Same risk-set/death reduction, same order-pinned window log chain.
    "q_survival" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 86400000000)
        |      AS BIGINT) AS dur,
        |    epoch_us(max(ts)) <
        |      (SELECT epoch_us(max(ts)) FROM events) - 172800000000 AS obs
        |  FROM events GROUP BY user_id),
        |p AS (
        |  SELECT dur AS t,
        |    CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY dur),
        |r AS (
        |  SELECT t, d,
        |    CAST(sum(n) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk
        |  FROM p),
        |sv AS (
        |  SELECT t, d, n_risk,
        |    sum(CASE WHEN d > 0 AND d < n_risk THEN
        |      ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      ELSE 0.0 END) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls
        |  FROM r)
        |SELECT t, n_risk, d,
        |  CASE WHEN d < n_risk THEN round(ls, 6) END AS log_surv,
        |  CASE WHEN d < n_risk THEN round(exp(ls), 6) ELSE 0.0 END AS surv
        |FROM sv WHERE d > 0""".stripMargin,
    "q_survival_hours" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 3600000000)
        |      AS BIGINT) AS dur,
        |    epoch_us(max(ts)) <
        |      (SELECT epoch_us(max(ts)) FROM events) - 25920000000 AS obs
        |  FROM events GROUP BY user_id),
        |p AS (
        |  SELECT dur AS t,
        |    CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM u GROUP BY dur),
        |r AS (
        |  SELECT t, d,
        |    CAST(sum(n) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk
        |  FROM p),
        |sv AS (
        |  SELECT t, d, n_risk,
        |    sum(CASE WHEN d > 0 AND d < n_risk THEN
        |      ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      ELSE 0.0 END) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls
        |  FROM r)
        |SELECT t, n_risk, d,
        |  CASE WHEN d < n_risk THEN round(ls, 6) END AS log_surv,
        |  CASE WHEN d < n_risk THEN round(exp(ls), 6) ELSE 0.0 END AS surv
        |FROM sv WHERE d > 0""".stripMargin,

    // Same strata, same quantized per-stratum terms.
    "q_post_strat" ->
      """WITH u AS (
        |  SELECT user_id,
        |    least(CAST(floor(count(*) / 5) AS BIGINT), 8) AS s,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y,
        |    user_id % 2 = 1 AS t
        |  FROM events GROUP BY user_id),
        |p AS (
        |  SELECT s,
        |    CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN t THEN 0 ELSE y END) AS BIGINT) AS syc,
        |    CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS syt
        |  FROM u GROUP BY s)
        |SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST(sum(CASE WHEN nc > 0 AND nt > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_strata_used,
        |  CAST(sum(CASE WHEN nc > 0 AND nt > 0 THEN nc + nt ELSE 0 END)
        |    AS BIGINT) AS n_used,
        |  CAST(sum(CASE WHEN nc > 0 AND nt > 0 THEN
        |    CAST(floor(CAST(nc + nt AS DOUBLE)
        |      * (CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
        |        - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE)) * 1e9) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS ps_num_q
        |FROM p""".stripMargin,

    // Same 2x2 cells, same fixed-order estimate.
    "q_did" ->
      """WITH o AS (
        |  SELECT user_id, ts >= TIMESTAMP '2024-01-15' AS post,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y,
        |    user_id % 2 = 1 AS t
        |  FROM events GROUP BY user_id, post),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN NOT t AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        |    CAST(sum(CASE WHEN NOT t AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        |    CAST(sum(CASE WHEN t AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        |    CAST(sum(CASE WHEN t AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        |    CAST(sum(CASE WHEN NOT t AND NOT post THEN y ELSE 0 END) AS BIGINT) AS scpre,
        |    CAST(sum(CASE WHEN NOT t AND post THEN y ELSE 0 END) AS BIGINT) AS scpost,
        |    CAST(sum(CASE WHEN t AND NOT post THEN y ELSE 0 END) AS BIGINT) AS stpre,
        |    CAST(sum(CASE WHEN t AND post THEN y ELSE 0 END) AS BIGINT) AS stpost
        |  FROM o)
        |SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
        |  CASE WHEN n_c_pre > 0 AND n_c_post > 0
        |        AND n_t_pre > 0 AND n_t_post > 0 THEN
        |    round((CAST(stpost AS DOUBLE) / CAST(n_t_post AS DOUBLE)
        |        - CAST(stpre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
        |      - (CAST(scpost AS DOUBLE) / CAST(n_c_post AS DOUBLE)
        |        - CAST(scpre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)), 6)
        |  END AS did
        |FROM a""".stripMargin,

    // Same cumulative windows, same fixed-order ln/exp chain (ulps
    // absorbed by round 6 — the repo's ln contract); DuckDB ln() is
    // natural log like Spark's log().
    "q_msprt" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(min(ts)) / 21600) AS BIGINT) AS day,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |d AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS dnc,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dnt,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE conv END) AS BIGINT) AS dcc,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS dct
        |  FROM u GROUP BY day),
        |c AS (
        |  SELECT day,
        |    CAST(sum(dnc) OVER w AS BIGINT) AS n_c,
        |    CAST(sum(dnt) OVER w AS BIGINT) AS n_t,
        |    CAST(sum(dcc) OVER w AS BIGINT) AS conv_c,
        |    CAST(sum(dct) OVER w AS BIGINT) AS conv_t
        |  FROM d
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |e AS (
        |  SELECT *,
        |    CASE WHEN n_c > 0 AND n_t > 0 AND conv_c + conv_t > 0
        |          AND conv_c + conv_t < n_c + n_t THEN
        |      0.5 * ln(
        |        (CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE)
        |          * (1.0 - CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
        |          * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)))
        |        / (CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE)
        |          * (1.0 - CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
        |          * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)) + 1e-4))
        |      + (CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |          - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE))
        |        * (CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |          - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE))
        |        * 1e-4
        |        / (2.0
        |          * (CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE)
        |            * (1.0 - CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
        |            * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)))
        |          * (CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE)
        |            * (1.0 - CAST(conv_c + conv_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
        |            * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)) + 1e-4))
        |    END AS ll
        |  FROM c)
        |SELECT
        |  strftime(make_timestamp(day * 21600000000), '%Y-%m-%d %H:%M') AS date,
        |  n_c, n_t, conv_c, conv_t,
        |  round(ll, 6) AS log_lambda,
        |  round(min(CASE WHEN ll IS NOT NULL
        |      THEN least(1.0, exp(-ll)) END) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS p_av
        |FROM e""".stripMargin,

    // Same integer-cents sufficient statistics, same fixed-order doubles.
    "q_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE x END) AS BIGINT) AS sx_c,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE y END) AS BIGINT) AS sy_c,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM u),
        |d AS (
        |  SELECT *,
        |    CAST(n_c + n_t AS DOUBLE) AS n,
        |    CAST(sx_c + sx_t AS DOUBLE) AS sx,
        |    CAST(sy_c + sy_t AS DOUBLE) AS sy
        |  FROM a),
        |e AS (
        |  SELECT *,
        |    n * CAST(sxy AS DOUBLE) - sx * sy AS covnum,
        |    n * CAST(sxx AS DOUBLE) - sx * sx AS varxnum,
        |    n * CAST(syy AS DOUBLE) - sy * sy AS varynum
        |  FROM d)
        |SELECT n_c, n_t,
        |  CASE WHEN n_c + n_t > 0 AND varxnum > 0.0 THEN
        |    round(covnum / varxnum, 6) END AS theta,
        |  CASE WHEN n_c > 0 AND n_t > 0 THEN
        |    round(CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |      - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) END AS lift_raw,
        |  CASE WHEN n_c > 0 AND n_t > 0 AND varxnum > 0.0 THEN
        |    round((CAST(sy_t AS DOUBLE) - (covnum / varxnum)
        |        * (CAST(sx_t AS DOUBLE) - CAST(n_t AS DOUBLE) * (sx / n)))
        |      / CAST(n_t AS DOUBLE)
        |      - (CAST(sy_c AS DOUBLE) - (covnum / varxnum)
        |        * (CAST(sx_c AS DOUBLE) - CAST(n_c AS DOUBLE) * (sx / n)))
        |      / CAST(n_c AS DOUBLE), 6) END AS lift_cuped,
        |  CASE WHEN n_c + n_t > 0 AND varxnum > 0.0 AND varynum > 0.0 THEN
        |    round(covnum * covnum / (varxnum * varynum), 6) END
        |    AS var_reduction
        |FROM e""".stripMargin,

    // Same Mann–Whitney restatement as q_classifier_auc (U = auc_num/2),
    // plus the tie-group cube sum and the identical fixed-order z.
    "q_rank_sum" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS m
        |  FROM events GROUP BY user_id),
        |t AS (
        |  SELECT m AS s,
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS y
        |  FROM u WHERE m IS NOT NULL),
        |g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS cp,
        |    CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM t GROUP BY s),
        |c AS (
        |  SELECT cp, cn,
        |    CAST(coalesce(sum(cn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS nb
        |  FROM g),
        |a AS (
        |  SELECT CAST(sum(cp) AS BIGINT) AS n_t, CAST(sum(cn) AS BIGINT) AS n_c,
        |    CAST(sum(cp * (2 * nb + cn)) AS BIGINT) AS u_x2
        |  FROM c),
        |tie AS (
        |  SELECT CAST(CAST(coalesce(sum(
        |      CAST(cp + cn AS HUGEINT) * CAST(cp + cn AS HUGEINT)
        |        * CAST(cp + cn AS HUGEINT) - CAST(cp + cn AS HUGEINT)),
        |    0) AS HUGEINT) AS DOUBLE) AS tie_sum
        |  FROM g)
        |SELECT n_c, n_t, u_x2, tie_sum,
        |  CASE WHEN n_c > 0 AND n_t > 0 AND n_c + n_t > 1
        |        AND CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE) / 12.0
        |          * (CAST(n_t + n_c AS DOUBLE) + 1.0
        |            - CAST(tie_sum AS DOUBLE)
        |              / (CAST(n_t + n_c AS DOUBLE)
        |                * (CAST(n_t + n_c AS DOUBLE) - 1.0))) > 0.0 THEN
        |    round((CAST(u_x2 AS DOUBLE) / 2.0
        |        - CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE) / 2.0)
        |      / sqrt(CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE) / 12.0
        |        * (CAST(n_t + n_c AS DOUBLE) + 1.0
        |          - CAST(tie_sum AS DOUBLE)
        |            / (CAST(n_t + n_c AS DOUBLE)
        |              * (CAST(n_t + n_c AS DOUBLE) - 1.0)))), 6)
        |  END AS z
        |FROM a, tie""".stripMargin,

    // The same closed form in SQL windows: cumulative deviation sum and
    // its running min/max — all BIGINT, no recursion needed.
    "q_cusum" ->
      """WITH b AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
        |    count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, t,
        |    CAST(sum(v - 30) OVER (PARTITION BY event_type ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM b),
        |m AS (
        |  SELECT event_type, t, c,
        |    CAST(min(c) OVER (PARTITION BY event_type ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lo,
        |    CAST(max(c) OVER (PARTITION BY event_type ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
        |  FROM c)
        |SELECT event_type,
        |  strftime(make_timestamp(t * 86400000000), '%Y-%m-%d') AS date,
        |  CAST(c - least(0, lo) AS BIGINT) AS cusum_high,
        |  CAST(greatest(0, hi) - c AS BIGINT) AS cusum_low,
        |  (c - least(0, lo) > 50 OR greatest(0, hi) - c > 50) AS alarm
        |FROM m""".stripMargin,
    "q_period_pivot" ->
      s"""SELECT user_id, count(*) AS count_all_time,
         |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS value_all_time,
         |$periodPivotCols
         |FROM events GROUP BY user_id""".stripMargin,
    "q_detail_filter" ->
      """SELECT event_id, user_id, event_type, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
        |FROM events
        |WHERE event_type IN ('purchase','signup')
        |  AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'""".stripMargin,
    "q_exclusion_windows" ->
      s"""SELECT event_type, count(*) AS n_rows,
         |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
         |FROM events WHERE NOT ($exclusionSql) GROUP BY event_type""".stripMargin,
    "q_topn_per_group" ->
      """SELECT event_type, rn, event_id, user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY ts DESC, event_id ASC) AS rn FROM events)
        |WHERE rn <= 5""".stripMargin,
    "q_dedup_keepfirst" ->
      """SELECT user_id, event_type, event_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts ASC, event_id ASC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,
    // Same reference-defined binning, same add-one smoothing, same fixed
    // parenthesization into one rounded double per bin.
    "q_psi_drift" ->
      """WITH b AS (
        |  SELECT min(value) AS lo, max(value) AS hi
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16'),
        |rb AS (
        |  SELECT CASE WHEN hi = lo THEN 0 ELSE
        |    CAST(least(greatest(floor((value - lo) / ((hi - lo) / 10)), 0), 9)
        |      AS INT) END AS bin
        |  FROM events, b
        |  WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL),
        |cb AS (
        |  SELECT CASE WHEN hi = lo THEN 0 ELSE
        |    CAST(least(greatest(floor((value - lo) / ((hi - lo) / 10)), 0), 9)
        |      AS INT) END AS bin
        |  FROM events, b
        |  WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL),
        |spine AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin),
        |rc AS (SELECT bin, count(*) AS c FROM rb GROUP BY 1),
        |cc AS (SELECT bin, count(*) AS c FROM cb GROUP BY 1),
        |m AS (
        |  SELECT spine.bin, CAST(coalesce(rc.c, 0) AS BIGINT) AS ref_cnt,
        |    CAST(coalesce(cc.c, 0) AS BIGINT) AS cur_cnt
        |  FROM spine LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)),
        |t AS (SELECT CAST(sum(ref_cnt) AS BIGINT) AS rn,
        |             CAST(sum(cur_cnt) AS BIGINT) AS cn FROM m)
        |SELECT bin, ref_cnt, cur_cnt,
        |  round(((ref_cnt + 1.0) / (rn + 10) - (cur_cnt + 1.0) / (cn + 10))
        |    * ln(((ref_cnt + 1.0) / (rn + 10)) /
        |         ((cur_cnt + 1.0) / (cn + 10))), 6) + 0.0 AS psi_term
        |FROM m, t""".stripMargin,

    // Union of categories, k = category count feeding the smoothing.
    "q_drift_categorical" ->
      """WITH rc AS (
        |  SELECT event_type AS category, count(*) AS c FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
        |cc AS (
        |  SELECT event_type AS category, count(*) AS c FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
        |m AS (
        |  SELECT coalesce(rc.category, cc.category) AS category,
        |    CAST(coalesce(rc.c, 0) AS BIGINT) AS ref_cnt,
        |    CAST(coalesce(cc.c, 0) AS BIGINT) AS cur_cnt
        |  FROM rc FULL OUTER JOIN cc ON rc.category = cc.category),
        |t AS (SELECT CAST(sum(ref_cnt) AS BIGINT) AS rn,
        |             CAST(sum(cur_cnt) AS BIGINT) AS cn,
        |             count(*) AS k FROM m)
        |SELECT category, ref_cnt, cur_cnt,
        |  round(((ref_cnt + 1.0) / (rn + k) - (cur_cnt + 1.0) / (cn + k))
        |    * ln(((ref_cnt + 1.0) / (rn + k)) /
        |         ((cur_cnt + 1.0) / (cn + k))), 6) + 0.0 AS psi_term
        |FROM m, t""".stripMargin,

    // Same daily series, same leads, same integer numerators.
    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, c,
        |    lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
        |    lead(c, 2) OVER (PARTITION BY event_type ORDER BY day) AS v2,
        |    lead(c, 3) OVER (PARTITION BY event_type ORDER BY day) AS v3
        |  FROM daily),
        |p AS (
        |  SELECT event_type, 1 AS lag, c, v1 AS vl FROM l WHERE v1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 2, c, v2 FROM l WHERE v2 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 3, c, v3 FROM l WHERE v3 IS NOT NULL)
        |SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(*) * sum(c * vl) - sum(c) * sum(vl) AS BIGINT) AS acov_num
        |FROM p GROUP BY 1, 2""".stripMargin,

    "q_daily_cumulative" ->
      """WITH b AS (
        |  SELECT make_timestamp(CAST(floor(epoch(ts) / 86400) * 86400000000 AS BIGINT)) AS bucket,
        |    count(*) AS n_rows,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series(min(bucket), max(bucket),
        |    INTERVAL 86400 SECONDS)) AS bucket FROM b),
        |f AS (
        |  SELECT spine.bucket, COALESCE(b.n_rows, 0) AS n_rows,
        |    CAST(COALESCE(b.total_value, 0) AS DECIMAL(18,2)) AS total_value
        |  FROM spine LEFT JOIN b ON spine.bucket = b.bucket)
        |SELECT strftime(bucket, '%Y-%m-%d') AS date, n_rows,
        |  CAST(total_value AS DOUBLE) AS total_value,
        |  CAST(sum(n_rows) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rows,
        |  CAST(CAST(sum(total_value) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS cum_value,
        |  'D' AS frequency
        |FROM f""".stripMargin,
    "q_6h_buckets" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600000000 AS BIGINT)),
        |    '%Y-%m-%d %H:%M:%S') AS bucket,
        |  event_type, count(*) AS n_rows
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_derived_union" ->
      """SELECT event_type, count(*) AS n_rows FROM (
        |  SELECT event_type FROM events
        |  UNION ALL
        |  SELECT 'big_purchase' AS event_type FROM events
        |  WHERE event_type = 'purchase' AND value > 150.0)
        |GROUP BY event_type""".stripMargin,
    "q_temporal_remap" ->
      """WITH rules AS (
        |  SELECT * FROM (VALUES
        |    (0, 3, 100, TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-20'),
        |    (1, 3, 200, TIMESTAMP '2024-01-10', TIMESTAMP '2024-01-25'),
        |    (2, 7, 300, TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01'))
        |    AS t(rule_idx, source_id, target_id, start_ts, end_ts)),
        |joined AS (
        |  SELECT e.event_id, e.user_id, e.event_type, r.rule_idx, r.target_id,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY CASE WHEN r.rule_idx IS NULL THEN 1 ELSE 0 END, r.rule_idx DESC) AS rn
        |  FROM events e LEFT JOIN rules r
        |    ON e.user_id = r.source_id AND e.ts >= r.start_ts AND e.ts < r.end_ts)
        |SELECT event_id, CAST(COALESCE(target_id, user_id) AS BIGINT) AS user_id, event_type
        |FROM joined WHERE rn = 1""".stripMargin,
    "q_record_reduction" ->
      """WITH err AS (
        |  SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'error'),
        |m AS (SELECT *, min(cents) OVER (PARTITION BY user_id) AS min_c FROM err),
        |tol AS (SELECT * FROM m WHERE cents <= min_c + 100),
        |ft AS (SELECT *, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM tol)
        |SELECT user_id,
        |  min(cents) AS record_cents,
        |  count(*) AS n_holders,
        |  list_aggregate(list_sort(list(DISTINCT CAST(event_id AS VARCHAR))), 'string_agg', ',')
        |    AS holder_ids
        |FROM ft WHERE ts <= first_ts + INTERVAL 3600 SECONDS
        |GROUP BY user_id""".stripMargin,
    // Mirrors CollectionLog.generate over the synthesized broadcasts:
    // dedup is on the RAW item string; hist counts fold into All_Time;
    // Item_2 repeats across groups; hist-only Item_99 routes to catch-all.
    "q_clog_report" ->
      """WITH bc AS (
        |  SELECT event_id AS raw_log_id, ts, 'user_' || user_id AS username,
        |    CASE event_type WHEN 'purchase' THEN 'Collection Log'
        |      WHEN 'view' THEN 'Valuable Drop' ELSE 'Other' END AS btype,
        |    CASE WHEN event_id % 7 = 0
        |      THEN (event_id % 5 + 2) || ' x Item_' || (event_id % 20)
        |      ELSE 'Item_' || (event_id % 20) END AS item_raw
        |  FROM events),
        |src AS (
        |  SELECT * FROM bc
        |  WHERE btype IN ('Collection Log', 'Valuable Drop')
        |    AND item_raw NOT IN ('Item_5')),
        |dd AS (
        |  SELECT raw_log_id, ts, item_raw FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY username, item_raw ORDER BY ts, raw_log_id) AS rn
        |    FROM src WHERE btype = 'Collection Log') WHERE rn = 1
        |  UNION ALL
        |  SELECT raw_log_id, ts, item_raw FROM src WHERE btype <> 'Collection Log'),
        |parsed AS (
        |  SELECT ts,
        |    CASE WHEN regexp_matches(trim(item_raw), '^([\d,]+)\s*x\s*(.+)')
        |      THEN trim(regexp_extract(trim(item_raw), '^([\d,]+)\s*x\s*(.+)', 2))
        |      ELSE trim(item_raw) END AS item,
        |    CASE WHEN regexp_matches(trim(item_raw), '^([\d,]+)\s*x\s*(.+)')
        |      THEN CAST(replace(regexp_extract(trim(item_raw), '^([\d,]+)\s*x\s*(.+)', 1), ',', '') AS BIGINT)
        |      ELSE 1 END AS qty
        |  FROM dd),
        |db AS (
        |  SELECT item,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-02-01' THEN qty ELSE 0 END) AS BIGINT) AS at,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
        |      THEN qty ELSE 0 END) AS BIGINT) AS jh
        |  FROM parsed GROUP BY 1),
        |hist(item, h) AS (VALUES ('Item_1', 10), ('Item_99', 5)),
        |universe AS (SELECT item FROM db UNION SELECT item FROM hist),
        |counts AS (
        |  SELECT u.item,
        |    COALESCE(db.at, 0) + COALESCE(hist.h, 0) AS all_time,
        |    COALESCE(db.jh, 0) AS jan_h1
        |  FROM universe u
        |  LEFT JOIN db ON u.item = db.item
        |  LEFT JOIN hist ON u.item = hist.item),
        |grp(g, item) AS (VALUES ('Bosses', 'Item_1'), ('Bosses', 'Item_2'),
        |  ('Bosses', 'Item_3'), ('Skilling', 'Item_4'), ('Skilling', 'Item_2')),
        |assigned AS (
        |  SELECT g, item FROM grp
        |  UNION ALL
        |  SELECT 'Other Items', item FROM counts
        |  WHERE all_time > 0 AND item NOT IN (SELECT item FROM grp))
        |SELECT a.g AS grp, a.item AS item_name,
        |  CAST(COALESCE(c.all_time, 0) AS BIGINT) AS all_time,
        |  CAST(COALESCE(c.jan_h1, 0) AS BIGINT) AS jan_h1
        |FROM assigned a LEFT JOIN counts c ON a.item = c.item""".stripMargin,
    // Mirrors PersonalBests.generate: union of historical VALUES and DB
    // rows, global-blacklist row filter + holder scrub, 0:00 → infinity
    // sentinel, similarity band around the per-task min, earliest-row
    // ordering (ts, hist-first, config order, raw id), grouping-window
    // achievers vs later holders, min_by historical holder list, and the
    // missing-task backfill for tasks the blacklist emptied.
    "q_pb_report" -> pbOracle,
    // Identical oracle: the single-pass aggregate must agree bit-for-bit.
    "q_pb_singlepass" -> pbOracle,
    // Mirrors Reports.recentAchievements: New_Level coalesced to 0,
    // 99-non-Combat → Maxed Skill (99), 126+Combat → Maxed Combat,
    // row_number per type ordered (ts DESC, raw_log_id ASC), limit 15.
    "q_recent_achievements" ->
      """WITH bc AS (
        |  SELECT event_id AS raw_log_id, ts,
        |    CASE event_type WHEN 'purchase' THEN 'Level Up'
        |      WHEN 'click' THEN 'Quest' WHEN 'signup' THEN 'Pet'
        |      ELSE 'Other' END AS btype,
        |    'user_' || user_id AS username,
        |    CASE WHEN event_id % 4 = 0 THEN 'Combat' ELSE 'Attack' END AS skill,
        |    CASE WHEN event_id % 17 = 0 THEN NULL
        |      WHEN event_id % 10 = 0 THEN 99
        |      WHEN event_id % 10 = 1 AND event_id % 4 = 0 THEN 126
        |      ELSE CAST(event_id % 99 AS INT) END AS new_level
        |  FROM events),
        |src AS (
        |  SELECT raw_log_id, ts, btype, username, skill,
        |    COALESCE(new_level, 0) AS nl
        |  FROM bc WHERE btype IN ('Level Up', 'Quest', 'Pet')),
        |combined AS (
        |  SELECT raw_log_id, ts, btype, username FROM src
        |  UNION ALL
        |  SELECT raw_log_id, ts, 'Maxed Skill (99)', username FROM src
        |  WHERE btype = 'Level Up' AND nl = 99 AND skill <> 'Combat'
        |  UNION ALL
        |  SELECT raw_log_id, ts, 'Maxed Combat', username FROM src
        |  WHERE btype = 'Level Up' AND nl = 126 AND skill = 'Combat'),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY btype
        |    ORDER BY ts DESC, raw_log_id ASC) AS rn
        |  FROM combined)
        |SELECT btype AS broadcast_type, raw_log_id, username,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM ranked WHERE rn <= 15""".stripMargin,
    // Mirrors Reports.timeseries: per-frequency bucket → gap-free spine
    // via generate_series → left join + coalesce → running sums. Weekly
    // label = Monday date_trunc + 6 days (pandas W-SUN parity).
    "q_timeseries_report" ->
      """WITH src AS (
        |  SELECT ts, COALESCE(CASE WHEN event_id % 13 = 0 THEN NULL
        |    ELSE CAST(round(value * 100, 0) AS BIGINT) END, 0) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |b6 AS (
        |  SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS b,
        |    count(*) AS c, CAST(sum(v) AS BIGINT) AS tv
        |  FROM src GROUP BY 1),
        |f6 AS (
        |  SELECT s.b, COALESCE(c, 0) AS c, COALESCE(tv, 0) AS tv
        |  FROM (SELECT unnest(generate_series((SELECT min(b) FROM b6),
        |    (SELECT max(b) FROM b6), INTERVAL 21600 SECONDS)) AS b) s
        |  LEFT JOIN b6 ON s.b = b6.b),
        |r6 AS (
        |  SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS date_str, c AS n, tv AS total_value,
        |    CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum_n,
        |    CAST(sum(tv) OVER (ORDER BY b) AS BIGINT) AS cum_value,
        |    '6h' AS freq
        |  FROM f6),
        |bd AS (
        |  SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS b,
        |    count(*) AS c, CAST(sum(v) AS BIGINT) AS tv
        |  FROM src GROUP BY 1),
        |fd AS (
        |  SELECT s.b, COALESCE(c, 0) AS c, COALESCE(tv, 0) AS tv
        |  FROM (SELECT unnest(generate_series((SELECT min(b) FROM bd),
        |    (SELECT max(b) FROM bd), INTERVAL 86400 SECONDS)) AS b) s
        |  LEFT JOIN bd ON s.b = bd.b),
        |rd AS (
        |  SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS date_str, c AS n, tv AS total_value,
        |    CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum_n,
        |    CAST(sum(tv) OVER (ORDER BY b) AS BIGINT) AS cum_value,
        |    'D' AS freq
        |  FROM fd),
        |bw AS (
        |  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS b,
        |    count(*) AS c, CAST(sum(v) AS BIGINT) AS tv
        |  FROM src GROUP BY 1),
        |fw AS (
        |  SELECT s.b, COALESCE(c, 0) AS c, COALESCE(tv, 0) AS tv
        |  FROM (SELECT unnest(generate_series((SELECT min(b) FROM bw),
        |    (SELECT max(b) FROM bw), INTERVAL 7 DAYS)) AS b) s
        |  LEFT JOIN bw ON s.b = bw.b),
        |rw AS (
        |  SELECT strftime(b + INTERVAL 6 DAYS, '%Y-%m-%d %H:%M:%S') AS date_str,
        |    c AS n, tv AS total_value,
        |    CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum_n,
        |    CAST(sum(tv) OVER (ORDER BY b) AS BIGINT) AS cum_value,
        |    'W' AS freq
        |  FROM fw)
        |SELECT * FROM r6 UNION ALL SELECT * FROM rd UNION ALL SELECT * FROM rw""".stripMargin,
    "q_detailed_report" ->
      """SELECT event_id AS raw_log_id,
        |  CASE event_type WHEN 'purchase' THEN 'Valuable Drop'
        |    ELSE 'PvP Kill' END AS broadcast_type,
        |  'user_' || user_id AS username,
        |  COALESCE(CASE WHEN event_id % 11 = 0 THEN NULL
        |    ELSE CAST(round(value * 100, 0) AS BIGINT) END, 0) AS item_value
        |FROM events
        |WHERE event_type IN ('purchase', 'view')
        |  AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'""".stripMargin,
    // Nested-loop restatement of the binned overlap join (the oracle is
    // the SEMANTICS; the engine's bin+arbitration plan must agree).
    "q_interval_join" ->
      """WITH l AS (
        |  SELECT user_id, event_id AS l_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 600000000 AS e
        |  FROM events WHERE event_type = 'view'),
        |r AS (
        |  SELECT user_id, event_id AS r_id, epoch_us(ts) AS s2,
        |    epoch_us(ts) + 600000000 AS e2
        |  FROM events WHERE event_type = 'click')
        |SELECT l.user_id, l_id, r_id
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND l.s <= r.e2 AND r.s2 <= l.e""".stripMargin,

    // Epoch-week integer indices (`//` == Spark `div` on non-negative
    // micros), distinct activity, min-period cohort, offset rollup.
    "q_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS p
        |  FROM events),
        |fs AS (SELECT user_id, min(p) AS cohort FROM act GROUP BY user_id)
        |SELECT cohort AS cohort_period, p - cohort AS period_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM act JOIN fs USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // Same layered-window funnel: a stage-k event qualifies iff a
    // qualifying stage-(k-1) event strictly precedes it in (ts, event_id)
    // order; empty frames count 0 on both engines.
    "q_funnel" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) OVER wprev > 0 AS hv
        |  FROM events
        |  WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |q1 AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND hv THEN ts END AS qc
        |  FROM o),
        |q2 AS (
        |  SELECT *, count(qc) OVER wprev > 0 AS hqc FROM q1
        |  WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |q3 AS (
        |  SELECT *, CASE WHEN event_type = 'purchase' AND hqc THEN ts END AS qp
        |  FROM q2),
        |agg AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
        |    min(qc) AS t1, min(qp) AS t2
        |  FROM q3 GROUP BY user_id)
        |SELECT user_id,
        |  CAST(CASE WHEN t2 IS NOT NULL THEN 3 WHEN t1 IS NOT NULL THEN 2
        |    WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed,
        |  CAST(epoch_us(t0) AS BIGINT) AS t_first_us,
        |  CAST(epoch_us(t2) AS BIGINT) AS t_convert_us
        |FROM agg""".stripMargin,

    // Same lag window, same µs-exact gap break, same per-source
    // normalization.
    "q_event_transitions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev,
        |    lag(ts) OVER w AS prev_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (
        |  SELECT prev AS from_type, event_type AS to_type FROM o
        |  WHERE prev IS NOT NULL
        |    AND epoch_us(ts) - epoch_us(prev_ts) <= 3600000000),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS total FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
        |  round(c.n / CAST(t.total AS DOUBLE), 4) AS p
        |FROM c JOIN t USING (from_type)""".stripMargin,

    // Same range predicate (strictly-before, 3-day lookback), same
    // (ts, id)-lexicographic first/last, same 'none' fallback.
    "q_attribution" ->
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id, ts AS conv_ts FROM events
        |  WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_id AS tid, ts AS tts, event_type AS ttype
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT c.user_id, c.conv_id, c.conv_ts, t.tid, t.tts, t.ttype
        |  FROM conv c LEFT JOIN touch t
        |    ON c.user_id = t.user_id AND t.tts < c.conv_ts
        |    AND t.tts >= c.conv_ts - INTERVAL 259200 SECOND),
        |per AS (
        |  SELECT user_id, conv_id, conv_ts,
        |    coalesce((list(ttype ORDER BY tts, tid)
        |      FILTER (WHERE tid IS NOT NULL))[1], 'none') AS first_touch,
        |    coalesce((list(ttype ORDER BY tts DESC, tid DESC)
        |      FILTER (WHERE tid IS NOT NULL))[1], 'none') AS last_touch,
        |    count(tid) AS n_touches
        |  FROM j GROUP BY 1, 2, 3)
        |SELECT first_touch, last_touch,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(n_touches) AS BIGINT) AS n_touches
        |FROM per GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, value, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM lagged),
        |sess AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |per AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
        |  CAST(CAST(max(sum_value) AS DECIMAL(18,2)) AS DOUBLE) AS max_session_value
        |FROM per GROUP BY user_id""".stripMargin,
    "q_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER win AS rn,
        |    lag(event_type) OVER win AS prev_attr
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |flagged AS (
        |  SELECT *, CASE WHEN rn = 1 OR prev_attr IS DISTINCT FROM event_type
        |    THEN 1 ELSE 0 END AS chg
        |  FROM ordered),
        |segs AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS seg
        |  FROM flagged),
        |per AS (
        |  SELECT user_id, seg, min(event_type) AS event_type, min(ts) AS valid_from
        |  FROM segs GROUP BY user_id, seg),
        |fin AS (
        |  SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to
        |  FROM per)
        |SELECT user_id, event_type,
        |  strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM fin""".stripMargin,
    // Global-window formulation; the engine's chunked carry is exact, so
    // the two must agree bit-for-bit. Same arithmetic shape:
    // pv + (nv - pv) * (dd1 / dd2) on 4-decimal-rounded observations.
    "q_interpolate" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, round(avg(value), 4) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |obs AS (SELECT d, v FROM daily WHERE day(d) % 3 = 1),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM obs),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM b),
        |f AS (
        |  SELECT s.d, o.v,
        |    last_value(o.v IGNORE NULLS) OVER
        |      (ORDER BY s.d ROWS UNBOUNDED PRECEDING) AS pv,
        |    last_value(CASE WHEN o.v IS NOT NULL THEN s.d END IGNORE NULLS) OVER
        |      (ORDER BY s.d ROWS UNBOUNDED PRECEDING) AS pd,
        |    first_value(o.v IGNORE NULLS) OVER
        |      (ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN o.v IS NOT NULL THEN s.d END IGNORE NULLS) OVER
        |      (ORDER BY s.d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM spine s LEFT JOIN obs o USING (d))
        |SELECT strftime(d, '%Y-%m-%d') AS d,
        |  round(CASE
        |    WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) *
        |      (CAST(date_diff('day', pd, d) AS DOUBLE) /
        |       CAST(date_diff('day', pd, nd) AS DOUBLE)) END, 4) AS v,
        |  CAST(v IS NULL AS INT) AS interpolated
        |FROM f""".stripMargin,
    // Calendar-window formulation over the full date spine, so it equals
    // the scatter-and-regroup for ANY input — with or without missing
    // days (count(v)/sum(v) skip absent days; QUALIFY drops target dates
    // no observation reaches, which trailingWindow never emits). Decimal
    // window sums are exact; the average divides in float64.
    "q_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(round(avg(value), 4) AS DECIMAL(18,4)) AS v
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM b),
        |f AS (SELECT s.d, dy.v FROM spine s LEFT JOIN daily dy USING (d))
        |SELECT strftime(d, '%Y-%m-%d') AS d,
        |  CAST(count(v) OVER w AS BIGINT) AS w_days,
        |  round(CAST(CAST(sum(v) OVER w AS DECIMAL(18,4)) AS DOUBLE)
        |    / (count(v) OVER w), 4) AS ma7
        |FROM f
        |WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |QUALIFY count(v) OVER w > 0""".stripMargin)
}
