package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * (n_c, n_t, conv_c, conv_t, lift, z, srm_chi2) where
    *   - lift = p_t − p_c (rounded 6; NULL when either arm is empty),
    *   - z is the pooled two-proportion z-statistic
    *     (p_t − p_c)/√(p̄(1−p̄)(1/n_t + 1/n_c)) (rounded 6; NULL when a
    *     degenerate pool — p̄ ∈ {0, 1} or an empty arm — makes it
    *     undefined),
    *   - srm_chi2 = (n_t − n_c)²/N, the 1-dof sample-ratio-mismatch χ²
    *     against the expected 50/50 split (rounded 6) — the guard that
    *     catches broken assignment BEFORE anyone reads the lift.
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
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col("__t") && col("__c"), 1L).otherwise(0L)).as("conv_c"),
        sum(when(col("__t") && col("__c"), 1L).otherwise(0L)).as("conv_t"))
    val nC = col("n_c").cast("double")
    val nT = col("n_t").cast("double")
    val pC = col("conv_c").cast("double") / nC
    val pT = col("conv_t").cast("double") / nT
    val pool = (col("conv_c") + col("conv_t")).cast("double") /
      (col("n_c") + col("n_t")).cast("double")
    val se = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / nT + lit(1.0) / nC))
    // Guards double as ANSI-mode safety: every division sits under a
    // when() that proves its denominator nonzero (ANSI throws on x/0).
    agg.select(col("n_c"), col("n_t"), col("conv_c"), col("conv_t"),
      when(col("n_c") > 0 && col("n_t") > 0, round(pT - pC, 6)).as("lift"),
      when(col("n_c") > 0 && col("n_t") > 0 &&
          col("conv_c") + col("conv_t") > 0 &&
          col("conv_c") + col("conv_t") < col("n_c") + col("n_t"),
        round((pT - pC) / se, 6)).as("z"),
      round((col("n_t") - col("n_c")).cast("double") *
        (col("n_t") - col("n_c")).cast("double") /
        (col("n_t") + col("n_c")).cast("double"), 6).as("srm_chi2"))
  }

  /** Mann–Whitney rank-sum test for a CONTINUOUS metric (where the
    * two-proportion z of [[abTest]] doesn't apply): one row
    * (n_c, n_t, u_x2, tie_sum, z) with
    *   - u_x2 = 2·U, the doubled tie-aware Mann–Whitney U of treatment
    *     over control — EXACTLY [[graft.ml.Eval.aucExact]]'s auc_num_x2
    *     with the treatment flag as the label (AUC and U are the same
    *     statistic: AUC = U/(n_t·n_c)), so the rank computation inherits
    *     the range-tiled no-global-sort shape and its integer exactness;
    *   - tie_sum = Σ(t³−t) over tie groups (BIGINT, from the same
    *     distinct-value frame);
    *   - z = (U − n_t·n_c/2)/σ with the standard tie-corrected
    *     σ² = (n_t·n_c/12)·((N+1) − tie_sum/(N(N−1))), rounded 6, no
    *     continuity correction; NULL when σ = 0 (all values tied or an
    *     empty arm).
    */
  def rankSum(df: DataFrame, treatment: Column, metric: Column): DataFrame = {
    val auc = graft.ml.Eval.aucExact(df, metric, treatment)
      .select(col("p").as("n_t"), col("n").as("n_c"),
        col("auc_num_x2").as("u_x2"))
    val ties = df.select(metric.as("__m")).where(col("__m").isNotNull)
      .groupBy(col("__m")).agg(count(lit(1)).as("__t"))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("tie_sum"))
    val nT = col("n_t").cast("double")
    val nC = col("n_c").cast("double")
    val bigN = (col("n_t") + col("n_c")).cast("double")
    val u = col("u_x2").cast("double") / lit(2.0)
    val sigma2 = nT * nC / lit(12.0) *
      (bigN + lit(1.0) - coalesce(col("tie_sum"), lit(0L)).cast("double") /
        (bigN * (bigN - lit(1.0))))
    auc.crossJoin(ties)
      .select(col("n_c"), col("n_t"), col("u_x2"),
        coalesce(col("tie_sum"), lit(0L)).as("tie_sum"),
        when(col("n_c") > 0 && col("n_t") > 0 &&
            col("n_c") + col("n_t") > 1 && sigma2 > lit(0.0),
          round((u - nT * nC / lit(2.0)) / sqrt(sigma2), 6)).as("z"))
  }
}
