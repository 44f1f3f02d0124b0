package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset split + shard-packing operators for the training-data surface:
  * the two layout steps between "curated corpus" and "what the trainer
  * reads".
  *
  * Both are DETERMINISTIC functions of stable ids — never `rand()` — so
  * re-runs, retried tasks, and a different cluster produce byte-identical
  * assignments (a training/eval split that silently reshuffles between
  * pipeline runs leaks eval data into training).
  */
object Sharding {

  /** Deterministic train/val/test assignment: a 60-bit md5 of the id maps
    * each row to one of `buckets` slots, and `splits` carves the slots into
    * named fractions ("train" -> 98 of 100, ...). Stable under re-runs,
    * insertions, and repartitioning — a new document never moves an
    * existing one between splits (hash-assignment, not row-number ranges).
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 98, "val" -> 1, "test" -> 1),
      buckets: Int = 100): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == buckets,
      s"split weights must sum to $buckets")
    val b = pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(buckets.toLong))
    val bounds = splits.scanLeft(0L) { case (acc, (_, w)) => acc + w }
    val label = splits.zip(bounds.sliding(2).toSeq).foldLeft(lit(null: String)) {
      case (acc, ((name, _), Seq(lo, hi))) =>
        when(b >= lo && b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Deterministic k-per-group sample: the k rows with the smallest
    * (md5(id), id) per group — an exact, repartition- and rerun-stable
    * stand-in for per-group reservoir sampling ("k docs per domain for
    * eval"). Because the hash is uniform, this IS a uniform sample of the
    * group, but one that a re-run, a retried task, or tomorrow's pipeline
    * reproduces exactly; `rand()`-based sampleBy cannot promise that.
    * One shuffle on the group key; the window sorts per group.
    */
  def sampleKPerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty && k > 0)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(Dedup.md5Hash60(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis, IPL 2006):
    * each row draws a deterministic uniform u = (md5_60(id)+1)/2^60 and
    * keeps key = ln(u)/w — the n LARGEST keys are exactly a weighted
    * sample without replacement (ln is a monotone transform of the paper's
    * u^(1/w), so the selected set is identical and pow never enters).
    * Hash-derived randomness means a re-run, a retried task, or another
    * engine draws the SAME sample — `rand()` cannot promise any of that.
    *
    * Scale: the top-n is `TakeOrderedAndProject` (per-partition heads of
    * size n, then an n-row driver merge) — no global sort, no shuffle of
    * the corpus. Rows with weight ≤ 0 or NULL can never be sampled and are
    * dropped up front.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n > 0)
    val u = (Dedup.md5Hash60(col(idCol).cast("string")) + 1).cast("double") /
      lit(math.pow(2, 60))
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__wkey").desc, col(idCol).asc)
      .limit(n)
      .drop("__wkey")
  }

  /** Per-group keep fractions that retarget the corpus to a desired domain
    * mixture while keeping as much data as possible: the output corpus size
    * `S = min_g(total_g / target_g)` is the largest for which every group
    * can supply its share without oversampling, and each group keeps
    * `target_g * S / total_g` of its weight. Groups absent from `target`
    * are dropped (fraction 0). The per-group totals are the only
    * driver-side data — one partial-agg'd shuffle over #groups rows.
    */
  def mixtureFractions(
      df: DataFrame, groupCol: String, weightCol: String,
      target: Map[String, Double]): Map[String, Double] = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      "target shares must be positive")
    val totals = df
      .filter(col(groupCol).isin(target.keys.toSeq: _*))
      .groupBy(groupCol)
      .agg(sum(col(weightCol).cast("double")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val missing = target.keySet -- totals.keySet
    require(missing.isEmpty, s"target groups absent from data: $missing")
    val s = target.map { case (g, t) => totals(g) / t }.min
    // The binding group's fraction is exactly 1 mathematically, but the
    // double rounding of t*(total/t)/total can land one ulp above it
    // (e.g. t=0.003, total=7.0) — clamp so sampleMixture's domain check
    // holds. Parity-safe: any threshold ≥ 2^60 keeps every row anyway.
    target.map { case (g, t) => g -> math.min(1.0, t * s / totals(g)) }
  }

  /** Deterministic per-group fraction sampling — the mixture-resampling
    * step ("reshape this corpus to 60% web / 30% code / 10% books"): keep a
    * row iff its salted 60-bit id hash falls below `fraction * 2^60` for its
    * group. Same guarantees as [[assignSplit]]: rerun-, insertion- and
    * partition-stable, never `rand()`; and threshold sampling is NESTED — a
    * later run with a smaller fraction keeps a strict subset, so growing
    * the corpus never churns previously-kept documents. The salt
    * decorrelates this decision from [[assignSplit]]'s bucket hash (same id,
    * different hash stream). Map-only: no shuffle.
    */
  def sampleMixture(
      df: DataFrame, groupCol: String, idCol: String,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions in [0,1]")
    val h = Dedup.md5Hash60(concat(lit("mix:"), col(idCol).cast("string")))
    // floor to an integer threshold: the comparison is long-vs-long on
    // every engine (no long→double rounding at the boundary).
    val thresh = fractions.foldLeft(lit(-1L)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit(math.floor(f * (1L << 60).toDouble).toLong))
        .otherwise(acc)
    }
    df.filter(h < thresh)
  }

  /** Deterministic per-group UPSAMPLING with replacement — the epoch-mixing
    * step of a training run ("see books 2.5×, web 1×, drop the rest"):
    * every row of group g emits `floor(r_g)` copies, plus one more iff its
    * salted 60-bit id hash falls below `frac(r_g)·2^60` — so multiplicity
    * is exactly `r_g` in expectation, rerun-/insertion-/partition-stable
    * (never `rand()`), and nested the same way [[sampleMixture]] is: raising
    * a factor only ADDS copies for the same ids. Groups absent from
    * `factors` drop (factor 0), mirroring [[sampleMixture]].
    *
    * The output carries an `epoch` column (0 … copies-1) so downstream
    * shuffling/packing can treat repeats as distinct examples. Map-only:
    * the explode fan-out is `ceil(r_g)` per row — no shuffle, no window.
    */
  def upsampleMixture(
      df: DataFrame, groupCol: String, idCol: String,
      factors: Map[String, Double]): DataFrame = {
    require(factors.values.forall(f => f >= 0 && f.isFinite),
      "factors must be finite and >= 0")
    val h = Dedup.md5Hash60(concat(lit("up:"), col(idCol).cast("string")))
    val whole = factors.foldLeft(lit(0L)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(math.floor(r).toLong)).otherwise(acc)
    }
    // Integer threshold on the fractional part, floored exactly like
    // sampleMixture so any engine reproduces the boundary comparison.
    val fracThresh = factors.foldLeft(lit(0L)) { case (acc, (g, r)) =>
      when(col(groupCol) === g,
        lit(math.floor((r - math.floor(r)) * (1L << 60).toDouble).toLong))
        .otherwise(acc)
    }
    df.withColumn("__copies", whole + when(h < fracThresh, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Pack rows into contiguous shards of ~`budget` total `weightCol` (e.g.
    * token count), in a deterministic hash order: a row whose global start
    * offset falls in `[k*budget, (k+1)*budget)` lands in shard k.
    *
    * 100 TB shape — a global running sum WITHOUT a global window (Spark's
    * empty-partition window moves everything to ONE task): the hash domain
    * is cut into `numBuckets` ranges (uniform, since the key is a hash —
    * no sampling pass needed), each bucket computes its own cumulative sum
    * in parallel, and the per-bucket totals (`numBuckets` longs — the only
    * driver-side data) become broadcast prefix offsets. The result is
    * bit-identical to the single-window formulation because bucket ranges
    * are prefixes of the global (hash, id) order.
    */
  def packByBudget(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      numBuckets: Int = 64): DataFrame = {
    require(budget > 0 && numBuckets > 0)
    // Weights coerced to non-null longs (budget arithmetic is integral);
    // null ids have no deterministic position and are rejected up front.
    val wc = coalesce(col(weightCol).cast("long"), lit(0L))
    // Ceil width so the max 60-bit hash still maps below numBuckets.
    val bucketWidth = (1L << 60) / numBuckets + 1
    val withH = df
      .filter(col(idCol).isNotNull)
      .withColumn("__w", wc)
      .withColumn("__h", Dedup.md5Hash60(col(idCol).cast("string")))
      // Integer div: __h exceeds 2^53, double division would misplace rows
      // near bucket boundaries.
      .withColumn("__b", expr(s"__h div $bucketWidth"))

    val totals = withH.groupBy("__b").agg(sum(col("__w")).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until numBuckets)
      .scanLeft(0L)((acc, b) => acc + totals.getOrElse(b.toLong, 0L))
    val offsetArr = array(offsets.take(numBuckets).map(lit): _*)

    // ROWS frame, not the default RANGE: rows tied on (__h, id) — duplicate
    // ids — must each see only the rows before them, not their frame peers.
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withH
      .withColumn("__start",
        sum(col("__w")).over(w) - col("__w") +
          element_at(offsetArr, col("__b").cast("int") + 1))
      .withColumn("shard_id", expr(s"__start div $budget"))
      .drop("__w", "__h", "__b", "__start")
  }
}
