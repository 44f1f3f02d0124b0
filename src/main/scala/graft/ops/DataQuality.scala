package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates for a continuously-ingested corpus: column profiles
  * and referential checks, computed as ORDINARY aggregation plans so they
  * ride the same scan as any other query (profile is one pass over the
  * table — Spark plans the multi-distinct agg via expand — and the checks
  * are anti-joins, never driver-side row loops).
  *
  * At 100 TB these run as a gate stage between ingest and publish (the
  * blue/green pointer in [[graft.gold.GoldSink]] only advances when the
  * checks pass), so a bad upstream drop never reaches readers.
  */
object DataQuality {

  /** One row per profiled column: total rows, null count, distinct count,
    * min/max (stringified — schema-independent report shape).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_nm"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("m")).select("m.*")
  }

  /** Rows of `child` whose `childKey` has no match in `parent.parentKey`
    * (null keys are NOT orphans — SQL FK semantics).
    */
  def orphans(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** Duplicate-key groups: one row per key value appearing more than once. */
  /** k-anonymity audit over a set of quasi-identifier columns: every row
    * whose quasi-identifier combination is shared by fewer than `k` rows
    * is re-identifiable to that group size. Returns one row per
    * EQUIVALENCE CLASS below k — (quasi cols..., class_size) — the
    * release gate a privacy review runs before publishing derived data
    * (Sweeney 2002). One partial-agg'd groupBy; the violating classes
    * are by definition the SMALL ones, so the result set is bounded even
    * when the input is not.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_dupes"))
      .filter(col("n_dupes") > 1)

  /** Distinct-l-diversity violations (Machanavajjhala et al. 2007): the
    * step after k-anonymity — a k-anonymous class whose SENSITIVE column
    * takes fewer than `l` distinct values still leaks (everyone in the
    * class shares the secret). One row per violating equivalence class:
    * (quasi cols..., class_size, sensitive_distinct). Same bounded-output
    * argument as [[kAnonymityViolations]], one partial-agg'd groupBy with
    * an exact count_distinct (the violating classes are small; the
    * aggregation itself is map-side combined on (quasi, sensitive)).
    */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("sensitive_distinct"))
      .filter(col("sensitive_distinct") < l)
  }

  /** Laplace(b) sample from a DETERMINISTIC md5-derived uniform — the
    * inverse-CDF transform x = −b·sign(u−½)·ln(1−2|u−½|). Seeded, not
    * secret: real DP requires cryptographic randomness; this is the
    * md5-bootstrap stance ([[graft.ops.Experiment]]) — the MECHANISM
    * (sensitivity clamps, scale calibration, budget accounting) is real
    * and oracle-gated, the noise source is pluggable. The ln argument is
    * floored at 1e-18 so the measure-zero u→1 edge yields a large finite
    * sample instead of ±∞.
    *
    * NOT A PRIVACY GUARANTEE unless the salt is secret: with a known
    * salt the noise is a public function of the public group key, so an
    * adversary reconstructs and subtracts it exactly. That is why
    * [[dpCounts]]/[[dpMean]] take the salt as a REQUIRED argument —
    * callers doing a real release must pass a secret (per-release,
    * high-entropy) salt; callers passing a fixed literal are running a
    * reproducible SIMULATION of the mechanism (the oracle-testing mode)
    * and get calibration, not privacy.
    */
  def laplaceNoise(key: Column, salt: String, scaleB: Column): Column = {
    val u = (graft.ops.Dedup.md5Hash60(concat(lit(salt),
      key.cast("string"))) + lit(1L)).cast("double") /
      lit(1.152921504606846976e18)
    val t = u - lit(0.5)
    -scaleB * signum(t) *
      log(greatest(lit(1e-18), lit(1.0) - lit(2.0) * abs(t)))
  }

  /** Noise key for a group: NULL-sentineled (U+0000) and
    * separator-delimited (U+0001), so a NULL group draws its own noise
    * identically on every engine (concat_ws would silently SKIP the
    * NULL) and multi-column groups like ("a","b") vs ("ab","") cannot
    * collide onto shared noise.
    */
  private def groupKey(groupCols: Seq[String]): Column =
    groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000")))
      .reduce((a, b) => concat(a, lit("\u0001"), b))

  /** Laplace-noised count release per group (sensitivity 1 →
    * Laplace(1/ε)): (groups..., noisy_count, noise_scale). One
    * partial-agg'd groupBy + a map-only noise projection keyed on the
    * group value.
    *
    * Output contract caveats (see [[laplaceNoise]]): (1) the output
    * deliberately labels the Laplace scale b (`noise_scale` = 1/ε), NOT
    * an `epsilon` — rows exist only for groups PRESENT in the data, so
    * group-key existence leaks regardless of noise and a bare release
    * from this variant carries no ε-DP guarantee over a private key
    * domain; (2) even the calibration is a guarantee only if `salt` is
    * secret. For a data-dependent group domain use [[dpCountsStable]],
    * which pays δ to threshold existence away (and therefore DOES stamp
    * its honest (epsilon, delta)), or restrict to a public known domain.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      salt: String): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0 && salt.nonEmpty)
    val key = groupKey(groupCols)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) ++ Seq(
        round(col("__n") +
          laplaceNoise(key, salt, lit(1.0 / epsilon)), 4)
          .as("noisy_count"),
        lit(1.0 / epsilon).as("noise_scale")): _*)
  }

  /** ε-DP mean release per group: contributions clamped to [lo, hi]
    * (the sensitivity bound), clamped sum + Laplace((hi−lo)/(ε/2)),
    * count + Laplace(1/(ε/2)) — sequential composition spends ε total —
    * mean = noisy_sum / max(noisy_count, 1). The sum scale uses
    * max(|lo|, |hi|) — the clamped sum's TRUE add/remove-neighbor
    * sensitivity (removing one contributor shifts the sum by up to the
    * largest clamped magnitude; (hi−lo) is only the SUBSTITUTION-model
    * sensitivity, under which the count would not move at all — mixing
    * the two under-noises any clamp range not containing 0).
    * Contributions are
    * quantized to a DECIMAL(18,2) cents grid after the clamp, so the
    * pre-noise sum is exact and aggregation-order-independent (the
    * house cross-engine contract); the <= half-cent per-row rounding is
    * dwarfed by the calibrated noise.
    *
    * Same output stance as [[dpCounts]]: per-leg `noise_scale_sum` /
    * `noise_scale_count` Laplace scales, not an `epsilon` — rows exist
    * only for present groups, so pair with a public key domain or a
    * stability threshold for a formal guarantee.
    */
  def dpMean(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, epsilon: Double,
      salt: String): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0 && hi > lo && salt.nonEmpty)
    val key = groupKey(groupCols)
    val clamped = least(greatest(col(valueCol), lit(lo)), lit(hi))
      .cast("decimal(18,2)")
    val half = epsilon / 2.0
    val sumSens = math.max(math.abs(lo), math.abs(hi))
    val nSum = laplaceNoise(key, salt + "_s", lit(sumSens / half))
    val nCnt = laplaceNoise(key, salt + "_n", lit(1.0 / half))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(clamped).as("__s"), count(lit(1)).as("__n"))
      .select(groupCols.map(col) ++ Seq(
        round(col("__s").cast("double") + nSum, 4).as("noisy_sum"),
        round(col("__n") + nCnt, 4).as("noisy_count"),
        round((col("__s").cast("double") + nSum) /
          greatest(col("__n") + nCnt, lit(1.0)), 4).as("noisy_mean"),
        lit(sumSens / half).as("noise_scale_sum"),
        lit(1.0 / half).as("noise_scale_count")): _*)
  }

  /** (ε,δ)-DP "stability histogram" count release for a DATA-DEPENDENT
    * group domain (Korolova et al. 2009 / Vadhan 2017 §3.3): noisy
    * count per present group, then drop every group whose noisy count
    * falls below τ = 1 + 2·ln(2/δ)/ε. A group with a single contributor
    * survives the threshold only with probability ≤ δ, so group-KEY
    * existence no longer leaks deterministically — the gap [[dpCounts]]
    * cannot close when the key set itself is private (e.g. free-text
    * usernames). Cost: small groups are suppressed (that is the point)
    * and the guarantee is (ε,δ) rather than pure ε. Same plan shape —
    * one partial-agg'd groupBy, map-only noise, a literal-threshold
    * filter — and the same secret-salt requirement for a real release.
    * Output: (groups..., noisy_count, epsilon, delta, threshold).
    */
  def dpCountsStable(df: DataFrame, groupCols: Seq[String],
      epsilon: Double, delta: Double, salt: String): DataFrame = {
    require(delta > 0 && delta < 1)
    val tau = 1.0 + 2.0 * math.log(2.0 / delta) / epsilon
    dpCounts(df, groupCols, epsilon, salt)
      .filter(col("noisy_count") >= lit(tau))
      // This variant's threshold buys the honest (ε,δ) stamp the plain
      // release cannot claim — swap the scale label for the budget.
      .drop("noise_scale")
      .withColumn("epsilon", lit(epsilon))
      .withColumn("delta", lit(delta))
      .withColumn("threshold", round(lit(tau), 4))
  }
}
