package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment (A/B test) readout statistics — the analytics family that
  * sits beside funnels/retention/attribution in any event pipeline. One
  * aggregation pass, map-side combined: the shuffle carries four BIGINT
  * sufficient statistics, never rows, so the readout costs the same at
  * 100 TB as at 100 MB.
  *
  * Float policy: every derived number (lift, z, χ²) is ONE fixed-order
  * IEEE expression over the exact integer counts, rounded to 6 decimals —
  * the repo-wide pattern that keeps cross-engine hashes stable (sqrt and
  * division are correctly-rounded per IEEE 754, so identical inputs +
  * identical expression order = identical doubles on any engine).
  */
object Experiment {

  /** Two-proportion experiment readout: one row
    * (n_c, n_t, n_null, conv_c, conv_t, lift, z, srm_chi2) where
    *   - lift = p_t − p_c (rounded 6; NULL when either arm is empty),
    *   - z is the pooled two-proportion z-statistic
    *     (p_t − p_c)/√(p̄(1−p̄)(1/n_t + 1/n_c)) (rounded 6; NULL when a
    *     degenerate pool — p̄ ∈ {0, 1} or an empty arm — makes it
    *     undefined),
    *   - srm_chi2 = (n_t − n_c)²/N, the 1-dof sample-ratio-mismatch χ²
    *     against the expected 50/50 split (rounded 6) — the guard that
    *     catches broken assignment BEFORE anyone reads the lift.
    *
    * A NULL treatment flag counts into `n_null` — NOT silently into
    * either arm and NOT dropped: unassigned units are precisely the
    * broken-assignment signal the SRM guard exists to surface, so they
    * must stay visible in the readout. A NULL `converted` flag counts as
    * NOT converted (explicit contract: for a conversion boolean, absence
    * of evidence is a non-conversion — the unit still belongs in its
    * arm's denominator, unlike a NULL continuous metric, which
    * [[rankSum]]/[[cuped]] must drop).
    *
    * @param df        one row per experiment UNIT (pre-aggregate events
    *                  to users upstream — unit-level rows are what makes
    *                  the proportions well-defined)
    * @param treatment boolean column: true = treatment arm
    * @param converted boolean column: unit converted
    */
  def abTest(df: DataFrame, treatment: Column, converted: Column): DataFrame = {
    val agg = df.select(treatment.as("__t"), converted.as("__c"))
      .agg(
        sum(when(col("__t") === false, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("__t") === true, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("__t").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("__t") === false && col("__c"), 1L).otherwise(0L))
          .as("conv_c"),
        sum(when(col("__t") === true && col("__c"), 1L).otherwise(0L))
          .as("conv_t"))
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val pC = col("conv_c").cast("double") / nC
    val pT = col("conv_t").cast("double") / nT
    val pool = (col("conv_c") + col("conv_t")).cast("double") /
      (col("n_c") + col("n_t")).cast("double")
    val se = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / nT + lit(1.0) / nC))
    // Guards double as ANSI-mode safety: every division sits under a
    // when() that proves its denominator nonzero (ANSI throws on x/0).
    agg.select(col("n_c"), col("n_t"), col("n_null"),
      col("conv_c"), col("conv_t"),
      when(col("n_c") > 0 && col("n_t") > 0, round(pT - pC, 6)).as("lift"),
      when(col("n_c") > 0 && col("n_t") > 0 &&
          col("conv_c") + col("conv_t") > 0 &&
          col("conv_c") + col("conv_t") < col("n_c") + col("n_t"),
        round((pT - pC) / se, 6)).as("z"),
      when(col("n_t") + col("n_c") > 0,
        round((col("n_t") - col("n_c")).cast("double") *
          (col("n_t") - col("n_c")).cast("double") /
          (col("n_t") + col("n_c")).cast("double"), 6)).as("srm_chi2"))
  }

  /** Poisson(1) CDF thresholds (17-significant-digit literals, identical
    * text in the DuckDB oracle so both engines parse the same doubles).
    * P(X ≥ 9) ≈ 1.1e-6 is folded into the top bucket — both engines cap
    * identically, so parity holds regardless of the truncation.
    */
  private[graft] val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** Percentile-bootstrap confidence interval for the conversion lift via
    * the POISSON BOOTSTRAP (Chamandy et al. 2012) — the one bootstrap
    * that works at 100 TB: instead of resampling n units with
    * replacement (which needs global n and a shared sample), every unit
    * independently draws a Poisson(1) multiplicity PER REPLICATE, so all
    * `replicates` resamples compute in ONE pass — explode each unit into
    * (replicate, multiplicity) rows, partial-agg per replicate, and the
    * shuffle carries replicates×4 BIGINT cells no matter how many units.
    *
    * Determinism: the multiplicity is the Poisson inverse-CDF of an
    * md5-derived uniform on (unit, replicate) — any engine redraws the
    * SAME bootstrap, which is what puts a resampling procedure under the
    * oracle gate (and makes reruns reproducible, which `rand()` cannot).
    *
    * CI bounds are ORDER STATISTICS (no interpolation — engines disagree
    * on quantile interpolation): the ⌈α·B⌉-th smallest and largest of the
    * per-replicate lifts, each lift rounded to 6 decimals first.
    * Replicates where an arm drew empty are dropped (counted in
    * `b_effective`). The final ranking is a window over B rows — bounded
    * by the replicate count, a documented O(B) finish.
    *
    * @return one row (b_effective, ci_lo, ci_hi)
    */
  def poissonBootstrapCI(df: DataFrame, unitId: Column, treatment: Column,
      converted: Column, replicates: Int = 200,
      alpha: Double = 0.025): DataFrame = {
    require(replicates > 1, s"need at least 2 replicates, got $replicates")
    require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val u = Dedup.md5Hash60(concat(col("__id").cast("string"), lit("|"),
        col("__b").cast("string"))).cast("double") /
      lit(1152921504606846976L).cast("double")
    val m = PoissonCdf.zipWithIndex
      .foldRight(lit(PoissonCdf.size.toLong): Column) { case ((c, k), acc) =>
        when(u < lit(c), lit(k.toLong)).otherwise(acc)
      }
    // A NULL unit id would null the md5 seed and fall through the CDF
    // chain to the top multiplicity (8× weight in EVERY replicate) —
    // silently catastrophic, so such rows are excluded up front. The id
    // must also be UNIQUE per row (it IS the unit key): duplicate ids
    // draw perfectly correlated multiplicities, which breaks the
    // per-unit-independence the Poisson bootstrap rests on — that
    // contract is the caller's, as with any keyed operator.
    val perRep = df
      .select(unitId.as("__id"), treatment.as("__t"), converted.as("__c"))
      .where(col("__id").isNotNull)
      .select(col("__id"), col("__t"), col("__c"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
      .select(col("__t"), col("__c"), col("__b"), m.as("__m"))
      .groupBy(col("__b"))
      .agg(
        sum(when(!col("__t"), col("__m")).otherwise(0L)).as("__nc"),
        sum(when(col("__t"), col("__m")).otherwise(0L)).as("__nt"),
        sum(when(!col("__t") && col("__c"), col("__m")).otherwise(0L)).as("__cc"),
        sum(when(col("__t") && col("__c"), col("__m")).otherwise(0L)).as("__ct"))
      .where(col("__nc") > 0 && col("__nt") > 0)
      .select(round(col("__ct").cast("double") / col("__nt").cast("double")
        - col("__cc").cast("double") / col("__nc").cast("double"), 6)
        .as("__lift"), col("__b"))
    val w = Window.orderBy(col("__lift"), col("__b"))
    val ranked = perRep
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    ranked.where(col("__rn") === ceil(lit(alpha) * col("__n")) ||
        col("__rn") === col("__n") - ceil(lit(alpha) * col("__n")) + 1)
      .agg(max(col("__n")).as("b_effective"),
        min(col("__lift")).as("ci_lo"), max(col("__lift")).as("ci_hi"))
  }

  /** Uplift (Qini) curve sufficient statistics: one row per distinct
    * uplift-model score `thr` with the per-arm unit and conversion
    * counts CUMULATIVE over all units scored ≥ thr —
    * (thr, n_t, n_c, conv_t, conv_c), all BIGINT. Every uplift readout
    * derives from this table: the Qini increment at a cutoff is
    * conv_t − conv_c·(n_t/n_c), the uplift curve is the same with rate
    * normalization, and the Qini coefficient is its integral vs the
    * random-targeting diagonal (Radcliffe 2007) — kept downstream so the
    * gated artifact stays exact integers.
    *
    * Same shape as [[graft.ml.Eval.rocPoints]] with four cumulative legs
    * instead of two: units collapse to one row per DISTINCT score by a
    * map-side-combined partial agg, the descending cumulatives run
    * tile-local over deterministic quantile-literal tiles + broadcast
    * base offsets. Rows with NULL score or treatment are excluded; NULL
    * converted counts as not converted (the [[abTest]] contract).
    */
  def upliftCurve(df: DataFrame, score: Column, treatment: Column,
      converted: Column): DataFrame = {
    val g = df
      .select(score.as("thr"), treatment.as("__t"),
        when(converted, 1L).otherwise(0L).as("__c"))
      .where(col("thr").isNotNull && col("__t").isNotNull)
      .groupBy(col("thr"))
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("__dnt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__dnc"),
        sum(when(col("__t"), col("__c")).otherwise(0L)).as("__dct"),
        sum(when(!col("__t"), col("__c")).otherwise(0L)).as("__dcc"))
    graft.ml.Eval.cumLegs(graft.ml.Eval.tileOf(g, col("thr")), col("thr"),
        Seq("__dnt" -> "n_t", "__dnc" -> "n_c",
          "__dct" -> "conv_t", "__dcc" -> "conv_c"),
        descending = true, inclusive = true)
      .select(col("thr"), col("n_t"), col("n_c"),
        col("conv_t"), col("conv_c"))
  }

  /** Kaplan–Meier survival curve with right-censoring (Kaplan & Meier
    * 1958) — the churn/retention estimator when some subjects are still
    * alive at observation time: at each death time t,
    *
    *   S(t) = Π_{u ≤ t} (1 − d_u / n_u)
    *
    * with d_u the deaths at u and n_u the risk set (subjects whose
    * duration ≥ u — censored subjects leave the risk set but never count
    * as deaths; ignoring censoring is the classic churn-rate bias this
    * estimator exists to fix).
    *
    * Scale shape: subjects collapse FIRST to one row per distinct
    * duration by a map-side-combined partial agg; the risk set is a
    * DESCENDING tiled cumulative sum over that frame and the survival
    * product an ASCENDING one — both ride the shared
    * [[graft.ml.Eval.cumLegs]] tiled-prefix-sum engine (tile-local
    * window + broadcast base offsets over quantile-literal tiles), the
    * exact rocPoints/upliftCurve shape, so seconds-precision durations
    * (|distinct| ≈ n) never funnel into one sorted partition. The log
    * leg is a float sum whose tile-fold order differs from a sequential
    * window's by ~ulp; the 6-decimal rounding absorbs ln ulps (the
    * repo's ln contract), same as the cross-engine oracle already does.
    *
    * @param observed true = event (death/churn) observed; false = right-
    *                 censored at `duration`
    * @return one row per DEATH time: (t, n_risk, d, log_surv, surv)
    */
  def kaplanMeier(df: DataFrame, duration: Column,
      observed: Column): DataFrame = {
    val per = df
      .select(duration.cast("long").as("t"), observed.as("__o"))
      .where(col("t").isNotNull && col("__o").isNotNull)
      .groupBy(col("t"))
      .agg(sum(when(col("__o"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__n"))
    val risk = graft.ml.Eval.cumLegs(graft.ml.Eval.tileOf(per, col("t")),
      col("t"), Seq("__n" -> "n_risk"), descending = true, inclusive = true)
    // d == n_risk (everyone still at risk dies — necessarily the MAX
    // duration, since any longer-lived subject would be in this risk
    // set) sends S to exactly 0: ln(0) is NULL on Spark but -inf on
    // DuckDB, so that terminal row is special-cased to (NULL, 0.0)
    // instead of ever evaluating the log on either engine.
    val terms = risk
      .withColumn("__term",
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      // Re-anchor before the ascending pass: the second cumLegs reads its
      // frame twice (local windows + tile totals), and without truncation
      // the totals branch would re-run the descending pass' window+join.
      .localCheckpoint(false)
    graft.ml.Eval.cumLegs(terms, col("t"),
        Seq("__term" -> "__ls"), descending = false, inclusive = true)
      .where(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"),
        when(col("d") < col("n_risk"), round(col("__ls"), 6)).as("log_surv"),
        when(col("d") < col("n_risk"), round(exp(col("__ls")), 6))
          .otherwise(lit(0.0)).as("surv"))
  }

  /** Post-stratified lift: weight each stratum's within-stratum lift by
    * the stratum's population share, w_s = N_s/N —
    * lift_ps = Σ_s w_s·(ȳ_ts − ȳ_cs) — removing the covariate imbalance
    * a lucky/unlucky split leaves in the raw lift (the categorical
    * sibling of [[cuped]]'s linear adjustment).
    *
    * Strata where either arm is empty cannot contribute a within-stratum
    * lift; they are EXCLUDED and the weights renormalized over the
    * contributing strata — reported via `n_strata` vs `n_strata_used` so
    * the exclusion is visible, never silent.
    *
    * Exactness: per-stratum sums are BIGINT (integer-cents metric); each
    * stratum's weighted term N_s·(ȳ_ts − ȳ_cs) — one fixed-order IEEE
    * expression — is floored onto a 1e-9 grid BEFORE the cross-strata
    * sum, so the reduction is an order-independent BIGINT sum (the
    * averagePrecision contract). lift_ps = ps_num_q / (1e9 · n_used).
    *
    * @return one row (n_strata, n_strata_used, n_used, ps_num_q)
    */
  def postStratifiedLift(df: DataFrame, treatment: Column, strata: Column,
      yCents: Column): DataFrame = {
    val per = df
      .select(strata.as("__s"), treatment.as("__t"),
        yCents.cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__t").isNotNull &&
        col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("__syc"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("__syt"))
    val usable = col("__nc") > 0 && col("__nt") > 0
    // term = N_s · (ȳ_ts − ȳ_cs), quantized; Σterm / N_used = lift_ps.
    val term = (col("__nc") + col("__nt")).cast("double") *
      (col("__syt").cast("double") / col("__nt").cast("double") -
        col("__syc").cast("double") / col("__nc").cast("double"))
    per.agg(
      count(lit(1)).as("n_strata"),
      sum(when(usable, 1L).otherwise(0L)).as("n_strata_used"),
      sum(when(usable, col("__nc") + col("__nt")).otherwise(0L)).as("n_used"),
      sum(when(usable, floor(term * lit(1e9)).cast("long")).otherwise(0L))
        .as("ps_num_q"))
  }

  /** Difference-in-differences: the pre/post × control/treatment 2×2,
    * did = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre) — the readout
    * when assignment wasn't randomized and each arm serves as its own
    * baseline. One partial-agg'd pass over (arm, period)-tagged rows
    * with integer-cents metrics; all four cell means and the estimate
    * are fixed-order doubles rounded 6 (NULL when any cell is empty).
    *
    * @return one row (n_c_pre, n_c_post, n_t_pre, n_t_post, did)
    */
  def diffInDiff(df: DataFrame, treatment: Column, post: Column,
      yCents: Column): DataFrame = {
    val agg = df
      .select(treatment.as("__t"), post.as("__p"),
        yCents.cast("long").as("__y"))
      .where(col("__t").isNotNull && col("__p").isNotNull &&
        col("__y").isNotNull)
      .agg(
        sum(when(!col("__t") && !col("__p"), 1L).otherwise(0L)).as("n_c_pre"),
        sum(when(!col("__t") && col("__p"), 1L).otherwise(0L)).as("n_c_post"),
        sum(when(col("__t") && !col("__p"), 1L).otherwise(0L)).as("n_t_pre"),
        sum(when(col("__t") && col("__p"), 1L).otherwise(0L)).as("n_t_post"),
        sum(when(!col("__t") && !col("__p"), col("__y")).otherwise(0L))
          .as("__scpre"),
        sum(when(!col("__t") && col("__p"), col("__y")).otherwise(0L))
          .as("__scpost"),
        sum(when(col("__t") && !col("__p"), col("__y")).otherwise(0L))
          .as("__stpre"),
        sum(when(col("__t") && col("__p"), col("__y")).otherwise(0L))
          .as("__stpost"))
    val did =
      (col("__stpost").cast("double") / col("n_t_post").cast("double") -
        col("__stpre").cast("double") / col("n_t_pre").cast("double")) -
      (col("__scpost").cast("double") / col("n_c_post").cast("double") -
        col("__scpre").cast("double") / col("n_c_pre").cast("double"))
    agg.select(col("n_c_pre"), col("n_c_post"), col("n_t_pre"),
      col("n_t_post"),
      when(col("n_c_pre") > 0 && col("n_c_post") > 0 &&
          col("n_t_pre") > 0 && col("n_t_post") > 0,
        round(did, 6)).as("did"))
  }

  /** Always-valid sequential test (mixture SPRT, Johari et al. 2017 —
    * the "peeking" problem): per observation day, the normal-mixture
    * likelihood ratio of the cumulative conversion lift,
    *
    *   logΛ_n = ½·ln(V/(V+τ²)) + Δ²·τ²/(2·V·(V+τ²))
    *
    * with Δ = p_t − p_c and V = p̄(1−p̄)(1/n_t + 1/n_c) over the counts
    * CUMULATIVE through that day, and the always-valid p-value
    * p_n = min_{m≤n} min(1, e^{−logΛ_m}) — monotone by construction, so
    * the experimenter may look every day and stop at first significance
    * without inflating false positives (what a fixed-n z-test cannot
    * offer).
    *
    * Scale shape: units reduce to ONE row per (day, arm) by partial agg;
    * the cumulative/running-min windows then run over the #days-row
    * daily frame — bounded by the calendar, the same documented O(days)
    * finish as the bootstrap's O(B) ranking. Days where an arm is still
    * empty or the pool is degenerate emit NULL and are skipped by the
    * running min. As in [[abTest]], a NULL `converted` flag counts as
    * NOT converted (the unit stays in its arm's denominator — explicit
    * contract, same as the streaming monitor). ln/exp/sqrt ulp
    * differences across engines are
    * absorbed by the 6-decimal rounding (the repo's ln contract).
    *
    * @param day   observation-day column (unit attributed to its day)
    * @param tau2  mixture-prior variance τ² (e.g. 1e-4 for lifts in
    *              fractions of a percent)
    * @return per day: (day, n_c, n_t, conv_c, conv_t, log_lambda, p_av)
    */
  def msprt(df: DataFrame, treatment: Column, converted: Column,
      day: Column, tau2: Double): DataFrame = {
    require(tau2 > 0.0, s"tau2 must be positive, got $tau2")
    val daily = df
      .select(day.as("day"), treatment.as("__t"), converted.as("__c"))
      .where(col("day").isNotNull && col("__t").isNotNull)
      .groupBy(col("day"))
      .agg(
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__dnc"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__dnt"),
        sum(when(!col("__t") && col("__c"), 1L).otherwise(0L)).as("__dcc"),
        sum(when(col("__t") && col("__c"), 1L).otherwise(0L)).as("__dct"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("n_c", sum(col("__dnc")).over(wCum))
      .withColumn("n_t", sum(col("__dnt")).over(wCum))
      .withColumn("conv_c", sum(col("__dcc")).over(wCum))
      .withColumn("conv_t", sum(col("__dct")).over(wCum))
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val pool = (col("conv_c") + col("conv_t")).cast("double") /
      (col("n_c") + col("n_t")).cast("double")
    val v = pool * (lit(1.0) - pool) * (lit(1.0) / nT + lit(1.0) / nC)
    val delta = col("conv_t").cast("double") / nT -
      col("conv_c").cast("double") / nC
    val logLambda = lit(0.5) * log(v / (v + lit(tau2))) +
      delta * delta * lit(tau2) / (lit(2.0) * v * (v + lit(tau2)))
    val valid = col("n_c") > 0 && col("n_t") > 0 &&
      col("conv_c") + col("conv_t") > 0 &&
      col("conv_c") + col("conv_t") < col("n_c") + col("n_t")
    val scored = cum
      .withColumn("__ll", when(valid, logLambda))
      .withColumn("__p", when(valid, least(lit(1.0), exp(-col("__ll")))))
    scored
      .withColumn("p_av", min(col("__p")).over(wCum))
      .select(col("day"), col("n_c"), col("n_t"), col("conv_c"),
        col("conv_t"), round(col("__ll"), 6).as("log_lambda"),
        round(col("p_av"), 6).as("p_av"))
  }

  /** CUPED variance reduction (Deng et al., WSDM 2013): adjust the
    * experiment metric with a PRE-EXPERIMENT covariate,
    * y′ = y − θ(x − x̄) with θ = cov(x, y)/var(x), shrinking metric
    * variance by the squared correlation ρ² without biasing the lift.
    *
    * One aggregation pass over integer-quantized (cents) metrics: every
    * sufficient statistic (per-arm n/Σx/Σy, pooled Σxy/Σx²/Σy²) is an
    * exact BIGINT, and the adjusted lift needs NO second pass because
    * per-arm sums of y′ are linear in those statistics:
    * Σ_arm y′ = Σ_arm y − θ(Σ_arm x − n_arm·x̄). θ, both lifts, and the
    * variance-reduction ratio ρ² are fixed-order IEEE expressions over
    * the integers, rounded 6 (NULL θ/ρ² when var(x) = 0; NULL lifts when
    * an arm is empty). Rows with NULL treatment/x/y are excluded.
    *
    * Magnitude contract (the [[graft.ops.Regression.groupTrend]] rule):
    * the pooled integer products must clear 2^63 — keep per-unit cents
    * below ~√(2^63/n), i.e. ~$300k per unit at 1e7 units. Rescale the
    * quantization (dollars, not cents) when totals run hotter; ANSI mode
    * raises on the overflow rather than corrupting it.
    *
    * @param xCents pre-period covariate in integer cents (BIGINT-safe)
    * @param yCents experiment metric in integer cents
    * @return one row (n_c, n_t, theta, lift_raw, lift_cuped, var_reduction)
    */
  def cuped(df: DataFrame, treatment: Column, xCents: Column,
      yCents: Column): DataFrame = {
    val agg = df
      .select(treatment.as("__t"), xCents.cast("long").as("__x"),
        yCents.cast("long").as("__y"))
      .where(col("__t").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
      .agg(
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col("__t"), col("__x")).otherwise(0L)).as("sx_c"),
        sum(when(col("__t"), col("__x")).otherwise(0L)).as("sx_t"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("sy_c"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("sy_t"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    val n = (col("n_c") + col("n_t")).cast("double")
    val sx = (col("sx_c") + col("sx_t")).cast("double")
    val sy = (col("sy_c") + col("sy_t")).cast("double")
    val covNum = n * col("sxy").cast("double") - sx * sy
    val varXNum = n * col("sxx").cast("double") - sx * sx
    val varYNum = n * col("syy").cast("double") - sy * sy
    val theta = covNum / varXNum
    val xBar = sx / n
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val liftRaw = col("sy_t").cast("double") / nT -
      col("sy_c").cast("double") / nC
    val liftCuped =
      (col("sy_t").cast("double") -
        theta * (col("sx_t").cast("double") - nT * xBar)) / nT -
      (col("sy_c").cast("double") -
        theta * (col("sx_c").cast("double") - nC * xBar)) / nC
    val rho2 = covNum * covNum / (varXNum * varYNum)
    agg.select(col("n_c"), col("n_t"),
      when(col("n_c") + col("n_t") > 0 && varXNum > lit(0.0),
        round(theta, 6)).as("theta"),
      when(col("n_c") > 0 && col("n_t") > 0, round(liftRaw, 6)).as("lift_raw"),
      when(col("n_c") > 0 && col("n_t") > 0 && varXNum > lit(0.0),
        round(liftCuped, 6)).as("lift_cuped"),
      when(col("n_c") + col("n_t") > 0 && varXNum > lit(0.0) &&
          varYNum > lit(0.0),
        round(rho2, 6)).as("var_reduction"))
  }

  /** Mann–Whitney rank-sum test for a CONTINUOUS metric (where the
    * two-proportion z of [[abTest]] doesn't apply): one row
    * (n_c, n_t, u_x2, tie_sum, z) with
    *   - u_x2 = 2·U, the doubled tie-aware Mann–Whitney U of treatment
    *     over control — EXACTLY [[graft.ml.Eval.aucExact]]'s auc_num_x2
    *     with the treatment flag as the label (AUC and U are the same
    *     statistic: AUC = U/(n_t·n_c)), so the rank computation inherits
    *     the range-tiled no-global-sort shape and its integer exactness;
    *   - tie_sum = Σ(t³−t) over tie groups (exact DECIMAL(38,0) sum
    *     surfaced as DOUBLE — see the [[graft.ml.Eval.aucExactWithTies]]
    *     magnitude contract — from the same distinct-value frame);
    *   - z = (U − n_t·n_c/2)/σ with the standard tie-corrected
    *     σ² = (n_t·n_c/12)·((N+1) − tie_sum/(N(N−1))), rounded 6, no
    *     continuity correction; NULL when σ = 0 (all values tied or an
    *     empty arm).
    */
  def rankSum(df: DataFrame, treatment: Column, metric: Column): DataFrame = {
    // Units with a NULL treatment flag are dropped up front: aucExact's
    // label fold would silently count them as control, corrupting U.
    // (abTest surfaces them as n_null; here the rank machinery has no
    // place for a third arm, so exclusion + this contract note is the
    // honest behavior.)
    val auc = graft.ml.Eval.aucExactWithTies(
      df.where(treatment.isNotNull), metric, treatment)
      .select(col("p").as("n_t"), col("n").as("n_c"),
        col("auc_num_x2").as("u_x2"), col("tie_sum"))
    val nT = col("n_t").cast("double")
    val nC = col("n_c").cast("double")
    val bigN = (col("n_t") + col("n_c")).cast("double")
    val u = col("u_x2").cast("double") / lit(2.0)
    val sigma2 = nT * nC / lit(12.0) *
      (bigN + lit(1.0) - col("tie_sum").cast("double") /
        (bigN * (bigN - lit(1.0))))
    auc.select(col("n_c"), col("n_t"), col("u_x2"), col("tie_sum"),
      when(col("n_c") > 0 && col("n_t") > 0 &&
          col("n_c") + col("n_t") > 1 && sigma2 > lit(0.0),
        round((u - nT * nC / lit(2.0)) / sqrt(sigma2), 6)).as("z"))
  }
}
