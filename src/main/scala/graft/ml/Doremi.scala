package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Domain-mixture weights via exponentiated-gradient ascent over
  * per-domain excess losses — the weight-update half of DoReMi (Xie et
  * al., "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining", NeurIPS 2023, Algorithm 1). DoReMi alternates proxy-model
  * training with a Group-DRO mixture update; in a data engine the losses
  * arrive as COLUMNS (a proxy model's and a reference model's per-document
  * scores, or any quality signal standing in for them), and this operator
  * solves the minimax mixture those losses imply:
  *
  *   λ_d   = max(0, mean_d(loss) − mean_d(ref))          (excess loss)
  *   α'_d  = α_d · exp(η·λ_d);  α' ← α'/Σα'              (EG step × T)
  *   α     = (1−c)·α' + c/k                              (uniform smoothing)
  *
  * Domains with loss above their reference get geometrically upweighted;
  * the smoothing floor keeps every domain sampled (DoReMi Algorithm 1,
  * step 2). The output feeds [[graft.ops.Sharding.upsampleMixture]] /
  * the weighted sampler exactly like hand-set mixture tables do.
  *
  * Determinism: per-domain losses aggregate as EXACT integer milli-unit
  * sums (caller quantizes; partial-agg'd, order-independent); the EG
  * recursion runs on the driver over domains in SORTED order with all
  * normalizer folds in that order, so an oracle can replay it with
  * ordered list folds; `exp` is the only libm call and final weights are
  * rounded by the caller (round(6) absorbs the ≤ few-ulp drift T
  * compounded steps can accumulate).
  *
  * Scale shape: ONE partial-agg'd shuffle reduces the corpus to k ≤
  * `maxDomains` rows (domains are categorical — sources, languages,
  * registered domains); the T-step recursion touches only that k-row
  * table on the driver, like the k-means/PQ driver-held models; output is
  * k rows. The document table is scanned exactly once.
  */
object Doremi {

  /** Per-domain (n_docs, excess, weight) from per-document integer
    * milli-unit loss columns.
    *
    * @param lossMilliCol proxy-model loss per document, milli-units (long)
    * @param refMilliCol  reference-model loss per document, milli-units
    * @param rounds       EG steps T
    * @param eta          EG step size η
    * @param smoothing    uniform-mixing floor c in [0, 1]
    * @param maxDomains   guard: fail loudly if the domain column is not
    *                     categorical rather than collecting unbounded rows
    */
  def mixtureWeights(
      docs: DataFrame,
      domainCol: String,
      lossMilliCol: String,
      refMilliCol: String,
      rounds: Int = 8,
      eta: Double = 0.5,
      smoothing: Double = 0.05,
      maxDomains: Int = 100000): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(eta > 0.0, s"eta must be > 0, got $eta")
    require(smoothing >= 0.0 && smoothing <= 1.0,
      s"smoothing must be in [0, 1], got $smoothing")
    val spark = docs.sparkSession
    // NULL domain = no provenance; NULL loss/ref = no measurement. Both
    // are excluded rather than smuggled in: a null loss row would still
    // raise n_docs while sum() skipped it, silently DILUTING the
    // domain's excess (and an all-null domain would NPE at collect).
    // Excess is therefore "over the measured rows"; a domain with no
    // measured rows gets no weight.
    val perDomain = docs
      .filter(col(domainCol).isNotNull &&
        col(lossMilliCol).isNotNull && col(refMilliCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(lossMilliCol).cast("long")).as("__loss"),
        sum(col(refMilliCol).cast("long")).as("__ref"))
      .orderBy("domain")
      .limit(maxDomains + 1)
      .collect()
    require(perDomain.length <= maxDomains,
      s"more than $maxDomains domains — $domainCol is not categorical")
    val schema = StructType(Seq(
      StructField("domain", StringType, nullable = false),
      StructField("n_docs", LongType, nullable = false),
      StructField("excess", DoubleType, nullable = false),
      StructField("weight", DoubleType, nullable = false)))
    if (perDomain.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    }
    // Excess loss per domain: exact integer sums divided once in float64.
    val domains = perDomain.map(_.getString(0))
    val nDocs = perDomain.map(_.getLong(1))
    val excess = perDomain.map { r =>
      val n = r.getLong(1)
      math.max(0.0, (r.getLong(2) - r.getLong(3)).toDouble / (1000.0 * n))
    }
    val k = domains.length
    // EG recursion, normalizers folded in domain-sorted order (the
    // arrays are already sorted by the orderBy above).
    var alpha = Array.fill(k)(1.0 / k)
    var t = 0
    while (t < rounds) {
      val stepped = Array.tabulate(k)(i => alpha(i) * math.exp(eta * excess(i)))
      var z = 0.0
      var i = 0
      while (i < k) { z += stepped(i); i += 1 }
      alpha = Array.tabulate(k)(i =>
        (1.0 - smoothing) * (stepped(i) / z) + smoothing / k)
      t += 1
    }
    val rows = (0 until k).map(i =>
      Row(domains(i), nDocs(i), excess(i), alpha(i)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
