package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators over the TPC-H-ish tables: the join/agg/scan
  * surface of SURVEY.md §2.1 (S5), §2.3 (J1/J2/J9), §2.4 (A1/A4/A7/A8).
  *
  * Plan-shape notes (verified with .explain("formatted")):
  *  - dimension joins broadcast (`part`, `customer` are small at any SF
  *    relative to facts; at 100 TB they stay broadcast-able dims or become
  *    shuffle joins that AQE re-plans);
  *  - aggregates are partial (map-side combine) before the single shuffle;
  *  - scans show PushedFilters + pruned ReadSchema.
  */
object RelationalQueries extends QueryGroup {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Final money outputs: exact decimal arithmetic, emitted as double so both
    * engines hash the identical float64 (see EventQueries.dbl).
    */
  private def dbl(c: Column): Column = dec(c).cast("double")

  val queries: Map[String, Q] = Map(
    // A1: group-agg leaderboard shape on the fact table.
    "q_agg_sum_group" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_price"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"))
    }),

    // J2: fact × broadcast dimension join, then agg.
    "q_join_dim_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_rows"), dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
    }),

    // J1: left-outer merge of per-key aggregates onto a dimension.
    "q_left_join_agg" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dec(sum(dec(col("o_totalprice")))).as("sum_total"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          dbl(coalesce(col("sum_total"), dec(lit(0)))).as("sum_total"))
    }),

    // J6-shape: left-semi (EXISTS).
    "q_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 200000.0)
      c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J7-shape: left-anti (NOT EXISTS).
    "q_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Multi-way join through the star schema (J9): region→nation→customer→orders.
    "q_star_join" -> ((s, dir) => {
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), dbl(sum(dec(col("o_totalprice")))).as("sum_total"))
    }),

    // A4: watermark max per key (incremental-fetch range resolution, S2).
    "q_watermark_max" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_order_date"),
          count(lit(1)).as("n_orders"))
    }),

    // A8: distinct universe via union of two sources.
    "q_distinct_union" -> ((s, dir) => {
      val a = Tables.lineitem(s, dir).select(col("l_partkey").as("pk"))
      val b = Tables.part(s, dir).filter(col("p_size") > 40).select(col("p_partkey").as("pk"))
      a.union(b).distinct()
    }),

    // P17/P18 + A7: pushed-down filter + count (scan with PushedFilters).
    "q_filter_count" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01")
          && col("l_returnflag") === "R")
        .agg(count(lit(1)).as("n_rows"), dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
    }),

    // U2: set difference — parts never shipped.
    "q_except_parts" -> ((s, dir) => {
      val p = Tables.part(s, dir).select(col("p_partkey").as("pk"))
      val shipped = Tables.lineitem(s, dir).select(col("l_partkey").as("pk"))
      p.except(shipped)
    }),

    // Distinct aggregation (expand + two-phase plan).
    "q_count_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // U4: pivot reshape with an explicit value list (deterministic columns).
    "q_pivot_reshape" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // TPC-H Q5-shaped supplier revenue rollup: fact ⋈ broadcast supplier
    // ⋈ broadcast nation, discounted revenue through exact decimal, one
    // partial-agg'd shuffle on the nation key.
    "q_supplier_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          countDistinct(col("s_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_lineitems"),
          // Scale stays 4 end to end: the product sum is exact and no
          // scale-reducing cast runs, so neither engine ever rounds
          // (DuckDB truncates dec->dec scale cuts where Spark half-ups).
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("decimal(18,4)").cast("double").as("revenue"))
    }),

    // Data-quality gate, part 1: one-pass column profile (multi-distinct
    // agg → expand; single scan) unpivoted to a schema-independent report.
    "q_data_quality" -> ((s, dir) => {
      graft.ops.DataQuality.profile(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_returnflag", "l_shipdate"))
    }),

    // k-anonymity release audit (DataQuality.kAnonymityViolations): the
    // equivalence classes of (event_type, value decade, day) smaller
    // than k=5 — exactly the rows a privacy review flags before
    // publishing derived event data. One partial-agg'd groupBy; the
    // violating classes are the small ones, so output is bounded.
    "q_k_anonymity" -> ((s, dir) => {
      val quasi = Tables.events(s, dir).select(
        col("event_type"),
        floor(col("value") / 10).cast("long").as("value_decade"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      graft.ops.DataQuality.kAnonymityViolations(quasi,
        Seq("event_type", "value_decade", "day"), k = 5L)
    }),

    // Differentially-private release (Laplace mechanism, md5-seeded
    // noise — the md5-bootstrap stance: mechanism real and oracle-gated,
    // noise source pluggable): per-segment noisy count (sensitivity 1,
    // eps=1) + clamped-contribution noisy sum/mean ([0,5000] bound,
    // eps=1 split over sum and count) — the aggregate-release shape a
    // privacy-gated analytics pipeline publishes instead of raw counts.
    // OUTPUT CONTRACT: the fixed literal salts make this a reproducible
    // SIMULATION of the mechanism (that is what lets DuckDB replay it
    // bit-for-bit) — `eps_total` labels noise calibration, NOT a formal
    // privacy guarantee; a real release passes a secret salt
    // (DataQuality.laplaceNoise scaladoc).
    "q_dp_release" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val counts = graft.ops.DataQuality.dpCounts(c, Seq("c_mktsegment"),
        epsilon = 1.0, salt = "dpc")
        .select(col("c_mktsegment"), col("noisy_count"))
      val means = graft.ops.DataQuality.dpMean(c, Seq("c_mktsegment"),
        "c_acctbal", lo = 0.0, hi = 5000.0, epsilon = 1.0, salt = "dpm")
        .select(col("c_mktsegment"), col("noisy_sum"), col("noisy_mean"))
      counts.join(means, Seq("c_mktsegment"))
        .withColumn("eps_total", lit(2.0))
    }),

    // (ε,δ)-DP stability-histogram release over a DATA-DEPENDENT key
    // domain: per-(segment, nation) noisy counts thresholded at
    // τ = 1 + 2·ln(2/δ)/ε, so a group's mere EXISTENCE no longer leaks
    // (a single-contributor group survives w.p. ≤ δ) — the fix for the
    // key-set side channel plain dpCounts has. Same simulation stance
    // as q_dp_release (fixed salt ⇒ oracle-replayable, not private).
    // δ=0.05 is a demo setting: at sf0.01 each (segment, nation) group
    // holds ~12 customers, so τ ≈ 8.4 actually exercises suppression —
    // a realistic δ=1e-6 would suppress every group at toy scale.
    "q_dp_stable" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      graft.ops.DataQuality.dpCountsStable(c,
        Seq("c_mktsegment", "c_nationkey"),
        epsilon = 1.0, delta = 0.05, salt = "dps")
    }),

    // l-diversity audit, the step after k-anonymity: (value-decade, day)
    // classes where the sensitive event_type takes < 3 distinct values —
    // homogeneous classes leak the secret even when k-anonymous.
    "q_l_diversity" -> ((s, dir) => {
      val quasi = Tables.events(s, dir).select(
        col("event_type"),
        floor(col("value") / 10).cast("long").as("value_decade"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      graft.ops.DataQuality.lDiversityViolations(quasi,
        Seq("value_decade", "day"), "event_type", l = 3L)
    }),

    // Data-quality gate, part 2: referential + uniqueness checks as
    // anti-join / groupBy counts (the publish gate in front of GoldSink).
    "q_integrity" -> ((s, dir) => {
      import graft.ops.DataQuality._
      val li = Tables.lineitem(s, dir)
      val checks = Seq(
        ("orphan_l_orderkey",
          orphans(li, "l_orderkey", Tables.orders(s, dir), "o_orderkey")),
        ("orphan_l_partkey",
          orphans(li, "l_partkey", Tables.part(s, dir), "p_partkey")),
        ("dup_o_orderkey",
          duplicateKeys(Tables.orders(s, dir), Seq("o_orderkey"))))
      checks.map { case (nm, bad) =>
        bad.agg(count(lit(1)).as("n_bad")).select(lit(nm).as("check_nm"), col("n_bad"))
      }.reduce(_.unionByName(_))
    }),

    // Morton key for the z-order clustered layout (gold.ZOrderLayout):
    // codegen'd bit interleave, checked bit-for-bit against a DuckDB
    // arithmetic formulation.
    "q_zorder_key" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.expr.ZOrder.zOrder(
          Seq(pmod(col("l_partkey"), lit(65536L)),
            pmod(col("l_suppkey"), lit(65536L))), 16).as("z"))
    }),

    // Binned range join: lineitem ship timestamps vs 8-day order windows.
    // No equi-key exists, so a naive BETWEEN join would be a nested loop;
    // RangeJoin quantizes the time axis into 1-day bins and equi-joins on
    // the bin (see graft.ops.RangeJoin for the 100 TB argument).
    "q_range_join" -> ((s, dir) => {
      val points = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
      val ivs = Tables.orders(s, dir)
        .filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .select(col("o_orderkey"), col("o_orderdate").as("iv_start"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("iv_end"))
      graft.ops.RangeJoin.pointInInterval(
        points, ivs, "l_shipdate", "iv_start", "iv_end", binWidth = 86400L)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_ships"), dbl(sum(dec(col("l_quantity")))).as("qty"))
    }),

    // Hierarchical subtotals: ROLLUP over (flag, status) with grouping
    // indicators. Spark plans grouping sets as ONE Expand + one shuffle —
    // not one aggregation pass per level.
    "q_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
    }),

    // Full cross-dimensional subtotals: CUBE (same Expand shape, 4 sets).
    "q_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
    }),

    // Fixed-width histogram of a numeric column: min/max from a one-row
    // aggregate broadcast into a map-only binning projection, then one
    // partial-agg'd shuffle on the (20-value) bin key. The two-pass shape
    // (stats pass + binning pass) is the 100 TB formulation — no sort, no
    // global window, bin arithmetic identical in any IEEE engine.
    "q_histogram" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_extendedprice").as("x"))
      val mm = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      li.crossJoin(broadcast(mm))
        .withColumn("bin",
          least(floor(((col("x") - col("mn")) / (col("mx") - col("mn"))) * 20)
            .cast("int"), lit(19)))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    }),

    // Per-group z-score outlier flagging: group moments from one partial-
    // agg'd pass, broadcast back into a map-only scoring projection.
    // Never a per-group window over the fact table. The moments are
    // rounded to 6 decimals BEFORE scoring so both engines score from
    // bit-identical doubles — aggregation-order epsilon in avg/stddev
    // can otherwise flip rows sitting on the |z| > 3 threshold.
    "q_outliers" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val stats = ev.groupBy("event_type")
        .agg(round(avg(col("value")), 6).as("mu"),
          round(stddev_samp(col("value")), 6).as("sd"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mu")) / col("sd"))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 3).as("z"))
    }),

    // Entity resolution: blocked edit-distance self-join on customer names
    // (see graft.ops.FuzzyJoin for the blocking-vs-all-pairs argument).
    "q_fuzzy_join" -> ((s, dir) => {
      graft.ops.FuzzyJoin.selfJoin(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", prefixLen = 16, maxDist = 1)
    }),

    // Record linkage by Jaro–Winkler: blocked threshold self-join over
    // 32-char document-text prefixes via the codegen'd jaro_winkler
    // expression. Gated as a PAIR SET (ids only — float scores never
    // reach the output), tau = 0.905 chosen off round achievable values
    // with a measured >=5e-4 margin to every pair on both fixture SFs.
    "q_jw_join" -> ((s, dir) => {
      graft.ops.FuzzyJoin.jaroWinklerSelfJoin(
        Tables.documents(s, dir).filter(length(col("text")) >= 8)
          .select(col("doc_id"), substring(col("text"), 1, 32).as("nm")),
        "doc_id", "nm", blockLen = 4, tau = 0.905)
    }),

    // Entity resolution END-TO-END: the JW pair graph from q_jw_join →
    // large-star/small-star connected components → one cluster id per
    // record → keep-best representative per cluster ((n_chars, doc_id)
    // lexicographic max; singletons keep themselves). The full record-
    // linkage pipeline — block, score, cluster, survive — in one query.
    "q_entity_resolution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, dir)
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"), substring(col("text"), 1, 32).as("nm"),
          col("n_chars"))
      val pairs = graft.ops.FuzzyJoin.jaroWinklerSelfJoin(
        base.select(col("doc_id"), col("nm")), "doc_id", "nm",
        blockLen = 4, tau = 0.905)
      val comp = graft.ops.Dedup.connectedComponents(
        pairs, "a_doc_id", "b_doc_id")
      base.join(comp, base("doc_id") === comp("id"), "left")
        .select(base("doc_id"),
          coalesce(col("component"), base("doc_id")).as("cluster_id"),
          col("n_chars"))
        .withColumn("keep",
          row_number().over(Window.partitionBy("cluster_id")
            .orderBy(desc("n_chars"), desc("doc_id"))) === 1)
        .select(col("doc_id"), col("cluster_id"), col("keep"))
    }),

    // CDC-style snapshot diff (see graft.ops.Reconcile): snapshot B is
    // derived from A with planted removals (%97), value mutations
    // (%101), and inserts under fresh keys (%103 + 10M). The hash-keyed
    // full-outer join must classify exactly those keys; the oracle
    // classifies by direct value comparison — equivalent verdicts, since
    // the hash canonicalization is injective on values.
    "q_snapshot_diff" -> ((s, dir) => {
      val a = Tables.orders(s, dir)
      val surviving = a.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(101)) === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val added = a.filter(pmod(col("o_orderkey"), lit(103)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
      graft.ops.Reconcile.snapshotDiff(
        a, surviving.unionByName(added), Seq("o_orderkey"))
    }),

    // Incremental rollup maintenance under the gate: three month-slice
    // increments merged into a running state (gold.IncrementalRollup)
    // must equal DuckDB's one-shot aggregation over all history —
    // decimal merges are exact, so the equality is bit-for-bit.
    "q_incremental_rollup" -> ((s, dir) => {
      import graft.gold.IncrementalRollup
      val facts = Tables.orders(s, dir)
      val slices = Seq(0, 1, 2).map(m =>
        IncrementalRollup.incrementOf(
          facts.filter(pmod(col("o_orderkey"), lit(3)) === m),
          Seq("o_custkey"), "o_totalprice"))
      slices.reduce(IncrementalRollup.merge)
        .select(col("o_custkey"), col("cnt"),
          col("total").cast("double").as("total"))
    }),

    // Sketch-based join-size estimation: CMS over each side's key column,
    // per-depth inner products, min over depths — plus the true size and
    // the unconditional overestimate bound, all under the gate.
    "q_join_size_est" -> ((s, dir) => {
      import graft.text.CountMin
      val o = Tables.orders(s, dir).select(col("o_custkey").cast("string").as("k"))
      val c = Tables.customer(s, dir)
        .filter(pmod(col("c_custkey"), lit(3)) === 0)
        .select(col("c_custkey").cast("string").as("k"))
      val est = CountMin.joinSizeEstimate(
        CountMin.build(o, "k"), CountMin.build(c, "k"))
      val truth = o.join(c, Seq("k")).agg(count(lit(1)).as("true_size"))
      est.crossJoin(truth)
        .select(col("join_size_est"), col("true_size"),
          (col("join_size_est") >= col("true_size")).as("bounded"))
    }),

    // Golden-record survivorship: per customer, the latest non-null value
    // of each planted field across their order "updates" (ordered by
    // orderkey — unique, so ties are impossible by construction).
    "q_golden_record" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val feed = o.select(col("o_custkey"), col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(3)) =!= 0,
          concat(lit("u"), col("o_custkey"), lit("@"),
            pmod(col("o_orderkey"), lit(7)))).as("email"),
        when(pmod(col("o_orderkey"), lit(4)) === 0,
          pmod(col("o_orderkey"), lit(1000)).cast("string")).as("phone"))
      graft.ops.Survivorship.goldenRecord(
        feed, "o_custkey", "o_orderkey", Seq("email", "phone"))
    }),

    // Bloom-prefiltered selective join: lineitem joins a 2%-selectivity
    // part subset; the big side is bloom-pruned BEFORE the shuffle. The
    // bloom is invisible to the result (false positives fall out in the
    // exact join), so the oracle is the plain join.
    "q_bloom_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"))
      val dim = Tables.part(s, dir)
        .filter(pmod(col("p_partkey"), lit(50)) === 0)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.ops.BloomJoin.filteredJoin(li, dim, Seq("l_partkey"),
          expectedItems = 10000L)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
    }),

    // Incremental JOIN maintenance: the orders⋈customer view maintained
    // under an appended delta slice (orderkey % 7 = 0 arrives "today")
    // must equal DuckDB's one-shot join — the delta algebra adds
    // dA⋈B ∪ A⋈dB ∪ dA⋈dB, each with the increment broadcast. Exact
    // integer/string columns, so equality is bit-for-bit.
    "q_incremental_join" -> ((s, dir) => {
      import graft.gold.IncrementalJoin
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      val (oBase, oDelta) = (o.filter(pmod(col("o_orderkey"), lit(7)) =!= 0),
        o.filter(pmod(col("o_orderkey"), lit(7)) === 0))
      // Customer side: base is every odd custkey, delta the even ones —
      // exercises the A⋈dB and dA⋈dB terms, not just appended facts.
      val (cBase, cDelta) = (c.filter(pmod(col("o_custkey"), lit(2)) === 1),
        c.filter(pmod(col("o_custkey"), lit(2)) === 0))
      val jOld = oBase.join(cBase, Seq("o_custkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("c_mktsegment"))
      jOld.unionByName(IncrementalJoin.joinDelta(
          oBase, oDelta, cBase, cDelta, Seq("o_custkey")))
        .groupBy(col("o_custkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
    }),

    // Skew-mitigated join (ops.SkewJoin): the hot-key salting recipe must
    // be row-for-row invisible — the oracle is the PLAIN join. The salt
    // spreads each part key over 8 shuffle buckets; the dimension side is
    // replicated once per salt value (still broadcast-sized).
    "q_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
        .withColumnRenamed("p_partkey", "l_partkey")
        .select(col("l_partkey"), col("p_brand"))
      graft.ops.SkewJoin.saltedJoin(li, p, Seq("l_partkey"), "l_orderkey",
          numSalts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_rows"),
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
    }),

    // Full ranking-window surface in one pass: rank-family over a
    // TIED ordering (floor(value) — rank/dense_rank/percent_rank/
    // cume_dist are per-key deterministic under ties), row-level
    // functions over the tie-broken total order.
    "q_window_suite" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tied = Window.partitionBy(col("event_type"))
        .orderBy(floor(col("value")).cast("long"))
      val total = Window.partitionBy(col("event_type"))
        .orderBy(floor(col("value")).cast("long"), col("event_id"))
      Tables.events(s, dir).select(
        col("event_type"), col("event_id"),
        floor(col("value")).cast("long").as("v"),
        rank().over(tied).as("rnk"),
        dense_rank().over(tied).as("drnk"),
        round(percent_rank().over(tied), 6).as("prnk"),
        round(cume_dist().over(tied), 6).as("cdist"),
        row_number().over(total).as("rn"),
        ntile(4).over(total).as("quartile"),
        lag(col("event_id"), 1).over(total).as("prev_id"),
        lead(col("event_id"), 2).over(total).as("next2_id"))
    }),

    // Multiset semantics: INTERSECT ALL keeps min multiplicity, EXCEPT
    // ALL subtracts multiplicities — reduced to per-key counts.
    "q_setops_all" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.filter(col("l_linenumber") <= 4).select(col("l_partkey").as("pk"))
      val b = li.filter(col("l_returnflag") === "R").select(col("l_partkey").as("pk"))
      val inter = a.intersectAll(b).groupBy(col("pk"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val diff = a.exceptAll(b).groupBy(col("pk"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      inter.unionByName(diff)
    }),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): planted null
    // keys on both sides must pair with each other, not vanish.
    "q_nullsafe_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), nullif(pmod(col("o_custkey"), lit(7L)), lit(3L)).as("k"))
      val d = Tables.orders(s, dir)
        .select(nullif(pmod(col("o_custkey"), lit(7L)), lit(3L)).as("k"))
        .distinct()
        .withColumn("bucket_name",
          concat(lit("b_"), coalesce(col("k").cast("string"), lit("null"))))
      o.join(d, o("k") <=> d("k"))
        .groupBy(col("bucket_name"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Skyline / Pareto front (ops.Skyline): docs not dominated on
    // (char length, distinct-token count) — sort-based 2D plan vs the
    // oracle's O(n²) NOT EXISTS restatement.
    "q_skyline_docs" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        size(array_distinct(
          split(graft.ops.Dedup.normalizeText(col("text")), " ")))
          .cast("long").as("n_uniq_toks"))
      graft.ops.Skyline.front2d(d, "len_chars", "n_uniq_toks")
        .select(col("doc_id"), col("len_chars"), col("n_uniq_toks"))
    }),

    // d-dimensional Pareto front (distributed SFS): longest AND most
    // lexically diverse AND most token-rich — gated against the O(n²)
    // NOT EXISTS domination oracle.
    "q_skyline_3d" -> ((s, dir) => {
      val toks = split(graft.ops.Dedup.normalizeText(col("text")), " ")
      val d = Tables.documents(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        size(array_distinct(toks)).cast("long").as("n_uniq_toks"),
        size(toks).cast("long").as("n_toks"))
      graft.ops.Skyline.front(d, Seq("len_chars", "n_uniq_toks", "n_toks"))
        .select(col("doc_id"), col("len_chars"), col("n_uniq_toks"),
          col("n_toks"))
    }),

    // Gorilla delta-of-delta timestamp compression profile per series:
    // exact bit-class histogram + compressed-vs-raw ratio.
    "q_gorilla_dod" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        col("event_id"),
        expr("unix_micros(ts) div 1000000").as("t"))
      graft.ops.DeltaOfDelta.profile(ev, "event_type", "t", "event_id")
    }),

    // Robust location estimates: 10%-trimmed and winsorized mean order
    // value per priority — the SUMMARY companions to the outlier
    // flaggers (a few wild rows can own a plain mean; these cap their
    // leverage). One exact per-group ranking (total order via the
    // orderkey tie-break), decimal-exact sums, one divide at the end.
    "q_trimmed_stats" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderkey"))
      graft.ops.RobustStats.trimmedStats(o, Seq("o_orderpriority"),
          "price", Seq("o_orderkey"), trim = 0.1)
        .select(col("o_orderpriority"), col("n_rows"), col("trim_k"),
          col("lo_clamp").cast("double").as("lo_clamp"),
          col("hi_clamp").cast("double").as("hi_clamp"),
          round(col("trimmed_mean"), 4).as("trimmed_mean"),
          round(col("winsor_mean"), 4).as("winsor_mean"))
    }),

    // Robust outliers: median/MAD flagging (complements q_outliers'
    // mean/stddev z-score — MAD ignores the outliers it is hunting, so a
    // few huge values cannot inflate the scale estimate and mask
    // themselves). Two percentile aggregations + a broadcast stats join;
    // med/mad rounded to 6 so both engines feed IDENTICAL doubles into
    // the shared scoring arithmetic.
    "q_mad_outliers" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val med = ev.groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(round(percentile(abs(col("value") - col("med")), lit(0.5)), 6)
          .as("mad"))
      ev.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
        .filter(col("mad") > 0)
        .withColumn("rz", (col("value") - col("med")) / (col("mad") * lit(1.4826)))
        .filter(abs(col("rz")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("rz"), 3).as("robust_z"))
    }))

  val oracles: Map[String, String] = Map(
    "q_agg_sum_group" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
        |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // Same two broadcast-dim hops, same scale-4 decimal routing for the
    // discounted product (no scale-reducing cast — engines round ties
    // differently).
    "q_supplier_rollup" ->
      """SELECT n_name,
        |  CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
        |  count(*) AS n_lineitems,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_join_dim_agg" ->
      """SELECT p_brand, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""".stripMargin,
    "q_left_join_agg" ->
      """SELECT c_custkey, c_mktsegment,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  CAST(CAST(COALESCE(sum_total, 0) AS DECIMAL(18,2)) AS DOUBLE) AS sum_total
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_total
        |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_watermark_max" ->
      """SELECT o_custkey, strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_date,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q_distinct_union" ->
      """SELECT DISTINCT pk FROM (
        |  SELECT l_partkey AS pk FROM lineitem
        |  UNION ALL
        |  SELECT p_partkey AS pk FROM part WHERE p_size > 40)""".stripMargin,
    "q_filter_count" ->
      """SELECT count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_returnflag = 'R'""".stripMargin,
    "q_except_parts" ->
      """SELECT p_partkey AS pk FROM part
        |EXCEPT
        |SELECT l_partkey AS pk FROM lineitem""".stripMargin,
    // Same md5-uniform → inverse-CDF Laplace transform, same clamp/cents
    // quantization, same association (-b * sign * ln), same literals.
    "q_dp_release" -> {
      def lap(salt: String, b: String): String =
        s"""(-(CAST($b AS DOUBLE)) * sign(u_$salt - 0.5) *
           |    ln(greatest(1e-18, 1.0 - 2.0 * abs(u_$salt - 0.5))))"""
          .stripMargin
      def u(salt: String): String =
        s"""(CAST(('0x' || substr(md5('$salt' ||
           |    coalesce(c_mktsegment, chr(0))), 1, 15))
           |    AS BIGINT) + 1) / 1.152921504606846976e18 AS u_$salt"""
          .stripMargin
      s"""WITH g AS (
         |  SELECT c_mktsegment, count(*) AS n,
         |    sum(CAST(least(greatest(c_acctbal, 0.0), 5000.0)
         |      AS DECIMAL(18,2))) AS s
         |  FROM customer GROUP BY 1),
         |h AS (
         |  SELECT c_mktsegment, n, s,
         |    ${u("dpc")},
         |    ${u("dpm_s")},
         |    ${u("dpm_n")}
         |  FROM g)
         |SELECT c_mktsegment,
         |  round(n + ${lap("dpc", "1.0")}, 4) AS noisy_count,
         |  round(CAST(s AS DOUBLE) + ${lap("dpm_s", "10000.0")}, 4)
         |    AS noisy_sum,
         |  round((CAST(s AS DOUBLE) + ${lap("dpm_s", "10000.0")}) /
         |    greatest(n + ${lap("dpm_n", "2.0")}, 1.0), 4) AS noisy_mean,
         |  CAST(2.0 AS DOUBLE) AS eps_total
         |FROM h""".stripMargin
    },
    // Stability histogram: same md5-uniform Laplace replay as
    // q_dp_release, same multi-column NULL-sentinel/separator key as
    // DataQuality.groupKey, plus the τ = 1 + 2·ln(2/δ)/ε threshold.
    "q_dp_stable" -> {
      val key = "'dps' || coalesce(CAST(c_mktsegment AS VARCHAR), chr(0))" +
        " || chr(1) || coalesce(CAST(c_nationkey AS VARCHAR), chr(0))"
      s"""WITH g AS (
         |  SELECT c_mktsegment, c_nationkey, count(*) AS n
         |  FROM customer GROUP BY 1, 2),
         |h AS (
         |  SELECT *, (CAST(('0x' || substr(md5($key), 1, 15))
         |      AS BIGINT) + 1) / 1.152921504606846976e18 AS u
         |  FROM g),
         |r AS (
         |  SELECT c_mktsegment, c_nationkey,
         |    round(n + (-(1.0) * sign(u - 0.5) *
         |      ln(greatest(1e-18, 1.0 - 2.0 * abs(u - 0.5)))), 4)
         |      AS noisy_count
         |  FROM h)
         |SELECT c_mktsegment, c_nationkey, noisy_count,
         |  CAST(1.0 AS DOUBLE) AS epsilon,
         |  CAST(0.05 AS DOUBLE) AS delta,
         |  round(1.0 + 2.0 * ln(2.0 / 0.05) / 1.0, 4) AS threshold
         |FROM r
         |WHERE noisy_count >= 1.0 + 2.0 * ln(2.0 / 0.05) / 1.0"""
        .stripMargin
    },
    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_pivot_reshape" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,
    // Same quasi-identifier derivation, same class-size threshold.
    "q_k_anonymity" ->
      """SELECT event_type,
        |  CAST(floor(value / 10) AS BIGINT) AS value_decade,
        |  strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS class_size
        |FROM events
        |GROUP BY 1, 2, 3
        |HAVING count(*) < 5""".stripMargin,

    // Same classes, same distinct-sensitive threshold.
    "q_l_diversity" ->
      """SELECT CAST(floor(value / 10) AS BIGINT) AS value_decade,
        |  strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS class_size,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS sensitive_distinct
        |FROM events
        |GROUP BY 1, 2
        |HAVING count(DISTINCT event_type) < 3""".stripMargin,

    "q_data_quality" -> {
      def prof(c: String) =
        s"""SELECT '$c' AS col_nm, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_v,
           |  CAST(max($c) AS VARCHAR) AS max_v
           |FROM lineitem""".stripMargin
      Seq("l_orderkey", "l_returnflag", "l_shipdate").map(prof)
        .mkString("\nUNION ALL\n")
    },
    "q_integrity" ->
      """SELECT 'orphan_l_orderkey' AS check_nm, count(*) AS n_bad FROM lineitem l
        |WHERE l_orderkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orphan_l_partkey', count(*) FROM lineitem l
        |WHERE l_partkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |UNION ALL
        |SELECT 'dup_o_orderkey', count(*) FROM (
        |  SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)""".stripMargin,
    "q_zorder_key" -> {
      val terms = (0 until 16).flatMap { i =>
        Seq(s"((((l_partkey % 65536) >> $i) & 1) << ${2 * i})",
          s"((((l_suppkey % 65536) >> $i) & 1) << ${2 * i + 1})")
      }.mkString(" | ")
      s"SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS z FROM lineitem"
    },
    "q_range_join" ->
      """SELECT o_orderkey, count(*) AS n_ships,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS qty
        |FROM orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
        |WHERE o_orderkey % 97 = 0
        |GROUP BY o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    // Identical IEEE arithmetic order as the Spark side:
    // ((x - mn) / (mx - mn)) * 20, floored then clamped.
    "q_histogram" ->
      """WITH mm AS (
        |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem)
        |SELECT least(CAST(floor(((l_extendedprice - mn) / (mx - mn)) * 20) AS INT), 19) AS bin,
        |  count(*) AS n
        |FROM lineitem, mm
        |GROUP BY 1""".stripMargin,
    "q_outliers" ->
      """WITH st AS (
        |  SELECT event_type, round(avg(value), 6) AS mu,
        |    round(stddev_samp(value), 6) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |  round((value - mu) / sd, 3) AS z
        |FROM events e JOIN st USING (event_type)
        |WHERE abs((value - mu) / sd) > 3.0""".stripMargin,
    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS a_c_custkey, b.c_custkey AS b_c_custkey,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b
        |  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
        | AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    "q_jw_join" ->
      """WITH p AS (
        |  SELECT doc_id, substr(text, 1, 32) AS nm
        |  FROM documents WHERE length(text) >= 8)
        |SELECT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id
        |FROM p a JOIN p b
        |  ON substr(a.nm, 1, 4) = substr(b.nm, 1, 4)
        | AND a.doc_id < b.doc_id
        |WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.905""".stripMargin,
    "q_entity_resolution" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id, substr(text, 1, 32) AS nm, n_chars
        |  FROM documents WHERE length(text) >= 8),
        |e AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM p a JOIN p b
        |    ON substr(a.nm, 1, 4) = substr(b.nm, 1, 4)
        |   AND a.doc_id < b.doc_id
        |  WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.905),
        |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        |walk(id, comp) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym) n
        |  UNION
        |  SELECT s.v, w.comp FROM walk w JOIN sym s ON s.u = w.id),
        |comp AS (SELECT id, CAST(min(comp) AS BIGINT) AS component
        |         FROM walk GROUP BY id)
        |SELECT p.doc_id,
        |  COALESCE(c.component, p.doc_id) AS cluster_id,
        |  row_number() OVER (
        |    PARTITION BY COALESCE(c.component, p.doc_id)
        |    ORDER BY p.n_chars DESC, p.doc_id DESC) = 1 AS keep
        |FROM p LEFT JOIN comp c ON c.id = p.doc_id""".stripMargin,
    "q_snapshot_diff" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 103 = 0)
        |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |       WHEN b.o_orderkey IS NULL THEN 'removed'
        |       WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
        |         OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |         OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |         OR a.o_orderdate IS DISTINCT FROM b.o_orderdate
        |         OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |       THEN 'changed' END AS change_type
        |FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        |WHERE CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |       WHEN b.o_orderkey IS NULL THEN 'removed'
        |       WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
        |         OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |         OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |         OR a.o_orderdate IS DISTINCT FROM b.o_orderdate
        |         OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |       THEN 'changed' END IS NOT NULL""".stripMargin,
    "q_incremental_rollup" ->
      """SELECT o_custkey, count(*) AS cnt,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey""".stripMargin,
    // Same md5-seeded sketches rebuilt in SQL; inner products and the
    // min-over-depths must agree exactly, as must the bound.
    "q_join_size_est" ->
      """WITH ok AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
        |ck AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer
        |       WHERE c_custkey % 3 = 0),
        |ea AS (SELECT k, d,
        |    CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '_' || k), 1, 15)) AS BIGINT)
        |      % 1024 AS bucket
        |  FROM ok, range(0, 4) r(d)),
        |eb AS (SELECT k, d,
        |    CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '_' || k), 1, 15)) AS BIGINT)
        |      % 1024 AS bucket
        |  FROM ck, range(0, 4) r(d)),
        |sa AS (SELECT d, bucket, count(*) AS ca FROM ea GROUP BY 1, 2),
        |sb AS (SELECT d, bucket, count(*) AS cb FROM eb GROUP BY 1, 2),
        |ip AS (SELECT sa.d, CAST(sum(ca * cb) AS BIGINT) AS ip
        |       FROM sa JOIN sb ON sa.d = sb.d AND sa.bucket = sb.bucket
        |       GROUP BY sa.d),
        |est AS (SELECT CAST(min(ip) AS BIGINT) AS join_size_est FROM ip),
        |tr AS (SELECT count(*) AS true_size FROM ok JOIN ck USING (k))
        |SELECT join_size_est, true_size,
        |  join_size_est >= true_size AS bounded
        |FROM est, tr""".stripMargin,
    // Same planted feed; arg_max FILTER = max_by with null-orderings
    // skipped (orderkey is unique, so no tie plane exists).
    "q_golden_record" ->
      """WITH feed AS (
        |  SELECT o_custkey, o_orderkey,
        |    CASE WHEN o_orderkey % 3 <> 0 THEN
        |      'u' || CAST(o_custkey AS VARCHAR) || '@' ||
        |        CAST(o_orderkey % 7 AS VARCHAR) END AS email,
        |    CASE WHEN o_orderkey % 4 = 0 THEN
        |      CAST(o_orderkey % 1000 AS VARCHAR) END AS phone
        |  FROM orders)
        |SELECT o_custkey,
        |  arg_max(email, o_orderkey) FILTER (WHERE email IS NOT NULL) AS email,
        |  arg_max(phone, o_orderkey) FILTER (WHERE phone IS NOT NULL) AS phone,
        |  count(*) AS n_sources
        |FROM feed GROUP BY o_custkey""".stripMargin,
    // The bloom prefilter is invisible: plain selective join + agg.
    "q_bloom_join" ->
      """SELECT p_brand, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_partkey % 50 = 0
        |GROUP BY p_brand""".stripMargin,
    // One-shot join over ALL of history — what the four-term delta union
    // must reproduce exactly.
    "q_incremental_join" ->
      """SELECT o_custkey, c_mktsegment, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_custkey, c_mktsegment""".stripMargin,
    "q_window_suite" ->
      """SELECT event_type, event_id,
        |  CAST(floor(value) AS BIGINT) AS v,
        |  CAST(rank() OVER tied AS INT) AS rnk,
        |  CAST(dense_rank() OVER tied AS INT) AS drnk,
        |  round(percent_rank() OVER tied, 6) AS prnk,
        |  round(cume_dist() OVER tied, 6) AS cdist,
        |  CAST(row_number() OVER total AS INT) AS rn,
        |  CAST(ntile(4) OVER total AS INT) AS quartile,
        |  lag(event_id, 1) OVER total AS prev_id,
        |  lead(event_id, 2) OVER total AS next2_id
        |FROM events
        |WINDOW
        |  tied AS (PARTITION BY event_type ORDER BY CAST(floor(value) AS BIGINT)),
        |  total AS (PARTITION BY event_type
        |    ORDER BY CAST(floor(value) AS BIGINT), event_id)""".stripMargin,
    "q_setops_all" ->
      """WITH a AS (SELECT l_partkey AS pk FROM lineitem WHERE l_linenumber <= 4),
        |b AS (SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'R'),
        |i AS (SELECT pk FROM a INTERSECT ALL SELECT pk FROM b),
        |d AS (SELECT pk FROM a EXCEPT ALL SELECT pk FROM b)
        |SELECT pk, CAST(count(*) AS BIGINT) AS n, 'intersect_all' AS op
        |FROM i GROUP BY pk
        |UNION ALL
        |SELECT pk, CAST(count(*) AS BIGINT) AS n, 'except_all' AS op
        |FROM d GROUP BY pk""".stripMargin,
    "q_nullsafe_join" ->
      """WITH o AS (
        |  SELECT o_orderkey, nullif(o_custkey % 7, 3) AS k FROM orders),
        |d AS (
        |  SELECT DISTINCT nullif(o_custkey % 7, 3) AS k FROM orders)
        |SELECT 'b_' || coalesce(CAST(d.k AS VARCHAR), 'null') AS bucket_name,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.k
        |GROUP BY 1""".stripMargin,

    // The sort-based sweep is the plan; the oracle is the O(n²)
    // NOT EXISTS dominance definition.
    "q_skyline_docs" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
         |    CAST(len(list_distinct(${OracleSql.toksSql})) AS BIGINT)
         |      AS n_uniq_toks
         |  FROM documents)
         |SELECT doc_id, len_chars, n_uniq_toks FROM d a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM d b
         |  WHERE b.len_chars >= a.len_chars
         |    AND b.n_uniq_toks >= a.n_uniq_toks
         |    AND (b.len_chars > a.len_chars
         |      OR b.n_uniq_toks > a.n_uniq_toks))""".stripMargin,
    "q_skyline_3d" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars,
         |    CAST(len(list_distinct(${OracleSql.toksSql})) AS BIGINT)
         |      AS n_uniq_toks,
         |    CAST(len(${OracleSql.toksSql}) AS BIGINT) AS n_toks
         |  FROM documents)
         |SELECT doc_id, len_chars, n_uniq_toks, n_toks FROM d a
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM d b
         |  WHERE b.len_chars >= a.len_chars
         |    AND b.n_uniq_toks >= a.n_uniq_toks
         |    AND b.n_toks >= a.n_toks
         |    AND (b.len_chars > a.len_chars
         |      OR b.n_uniq_toks > a.n_uniq_toks
         |      OR b.n_toks > a.n_toks))""".stripMargin,
    "q_gorilla_dod" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) // 1000000 AS t
        |  FROM events),
        |d1 AS (
        |  SELECT event_type, t, event_id,
        |    t - lag(t) OVER (PARTITION BY event_type ORDER BY t, event_id)
        |      AS d
        |  FROM e),
        |d2 AS (
        |  SELECT event_type,
        |    d - lag(d) OVER (PARTITION BY event_type ORDER BY t, event_id)
        |      AS dod
        |  FROM d1),
        |c AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(count(*) FILTER (WHERE dod = 0) AS BIGINT) AS c1,
        |    CAST(count(*) FILTER (WHERE dod <> 0 AND dod BETWEEN -63 AND 64)
        |      AS BIGINT) AS c9,
        |    CAST(count(*) FILTER (WHERE dod IS NOT NULL
        |      AND NOT dod BETWEEN -63 AND 64 AND dod BETWEEN -255 AND 256)
        |      AS BIGINT) AS c12,
        |    CAST(count(*) FILTER (WHERE dod IS NOT NULL
        |      AND NOT dod BETWEEN -255 AND 256 AND dod BETWEEN -2047 AND 2048)
        |      AS BIGINT) AS c16,
        |    CAST(count(*) FILTER (WHERE dod IS NOT NULL
        |      AND NOT dod BETWEEN -2047 AND 2048) AS BIGINT) AS c37
        |  FROM d2 GROUP BY event_type),
        |p AS (
        |  SELECT *,
        |    c1 * 1 + c9 * 9 + c12 * 12 + c16 * 16 + c37 * 37 AS payload_bits,
        |    c1 + c9 + c12 + c16 + c37 AS n_dod
        |  FROM c)
        |SELECT event_type, n_points, c1, c9, c12, c16, c37,
        |  CAST(payload_bits AS BIGINT) AS payload_bits,
        |  CAST(n_dod AS BIGINT) AS n_dod,
        |  CASE WHEN n_dod > 0
        |    THEN round(CAST(payload_bits AS DOUBLE) / (n_dod * 64), 4)
        |  END AS ratio
        |FROM p""".stripMargin,

    // Salting is an implementation detail: the oracle is the unsalted join.
    "q_salted_join" ->
      """SELECT p_brand, count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    // Same total order (price, orderkey), same floor(0.1·n) cut, sums
    // kept DECIMAL until the single final divide; the boundary-rank rows
    // double as the winsorization clamps on both engines.
    "q_trimmed_stats" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS rk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |k AS (SELECT *, CAST(floor(0.1 * n) AS BIGINT) AS tk FROM r)
        |SELECT pri AS o_orderpriority,
        |  max(n) AS n_rows, max(tk) AS trim_k,
        |  CAST(max(CASE WHEN rk = tk + 1 THEN v END) AS DOUBLE) AS lo_clamp,
        |  CAST(max(CASE WHEN rk = n - tk THEN v END) AS DOUBLE) AS hi_clamp,
        |  round(CAST(sum(CASE WHEN rk > tk AND rk <= n - tk THEN v END)
        |      AS DOUBLE) / (max(n) - 2 * max(tk)), 4) AS trimmed_mean,
        |  round(CAST(sum(CASE WHEN rk > tk AND rk <= n - tk THEN v END)
        |      + max(tk) * max(CASE WHEN rk = tk + 1 THEN v END)
        |      + max(tk) * max(CASE WHEN rk = n - tk THEN v END)
        |      AS DOUBLE) / max(n), 4) AS winsor_mean
        |FROM k GROUP BY pri""".stripMargin,

    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type,
        |    round(quantile_cont(abs(value - med), 0.5), 6) AS mad
        |  FROM events e JOIN med USING (event_type) GROUP BY e.event_type)
        |SELECT event_id, e.event_type, value,
        |  round((value - med) / (mad * 1.4826), 3) AS robust_z
        |FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
        |WHERE mad > 0 AND abs((value - med) / (mad * 1.4826)) > 3.0""".stripMargin)
}
