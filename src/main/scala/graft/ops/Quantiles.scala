package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing: label every row with the quantile band of a
  * numeric column (quartiles, deciles, …).
  *
  * Never `ntile` — a global ntile needs a total order, which drags the
  * whole table through one partition's sort. Instead: boundaries come
  * from ONE aggregate pass, are broadcast (a handful of doubles), and a
  * map-only projection bands each row — the same two-pass
  * stats-then-scan shape as the histogram and z-score operators.
  *
  * `exact = true` resolves boundaries by distributed rank selection
  * (global: literal-boundary tiling; per-group: a spillable rank
  * window) — never Spark's `percentile`, whose aggregation buffer
  * holds every group member. `exact = false` is the cheapest path →
  * `percentile_approx` (mergeable t-digest-style sketch, one
  * partial-agg'd pass, bounded error on the *boundaries* only — rows
  * near a boundary may swap bands, everything else is identical).
  */
object Quantiles {

  /** EXACT quantile_cont boundaries by distributed rank selection — the
    * shape that survives where a single `percentile` reducer cannot:
    * tile the value column on DRIVER-COMPUTED literal quantile
    * boundaries ([[graft.ml.Eval.tileBoundaries]] — the engine-wide
    * tiling primitive; each tile sorts locally, in parallel), turn
    * per-tile counts into global base offsets, and fetch ONLY the
    * ≤ 2·|probs| order statistics the interpolation needs. Nothing
    * column-sized ever reaches one task, and nothing is checkpointed:
    * the tile id is a pure function of the value, so the counts pass
    * and the selection pass cannot disagree across recomputation —
    * unlike `spark_partition_id()` over `repartitionByRange`, which
    * re-samples range boundaries per plan instantiation and is banned
    * engine-wide for exactly this two-pass shape (it only ever worked
    * here behind a full-column localCheckpoint pin).
    *
    * The interpolation `(⌈h⌉ − h)·lo + (h − ⌊h⌋)·hi` with h = (n−1)·p
    * (lo exactly when h is integral) reproduces Spark's `percentile`
    * AND DuckDB's `quantile_cont` bitwise — both engines use this lerp
    * tree, NOT the algebraically-equal `lo + (hi − lo)·frac`, which
    * differs in the last ulp on real data — so swapping this in under
    * an oracle-gated query changes the plan, not one bit of output.
    * Value ties straddling a tile boundary are harmless: selection only
    * reads the VALUE at a rank, identical under any tie order. NaN
    * values rank above every finite value (both engines' sort order),
    * per the tiling primitive's NaN contract.
    */
  def exactQuantiles(df: DataFrame, xCol: String,
      probs: Seq[Double]): Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.select(col(xCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = graft.ml.Eval.tileBoundaries(vals, col("__x"), parts)
    // Persisted across the two actions (counts pass + selection pass)
    // so the value column scans once; the tile id being a pure function
    // of the value already guaranteed the passes AGREE, the persist
    // just stops the second scan from re-reading the source.
    val tiled = vals.withColumn("__pid",
      graft.ml.Eval.tilePid(col("__x"), bounds))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = tiled.groupBy("__pid").agg(count(lit(1)).as("__n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = sizes.map(_._2).sum
      if (n == 0) return probs.map(_ => Double.NaN)
      val hs = probs.map(p => (n - 1) * p)
      val ranks = hs.flatMap(h =>
        Seq(math.floor(h).toLong, math.ceil(h).toLong)).distinct.sorted
      // rank → (tile, 1-based local index) via exclusive tile offsets.
      val bases = sizes.scanLeft(0L)(_ + _._2).init
      val located = ranks.map { r =>
        val i = sizes.indices.findLast(i => bases(i) <= r).get
        (r, sizes(i)._1, r - bases(i) + 1)
      }
      // The wanted (pid, rank) pairs are driver-known BEFORE the window
      // runs, so restrict the rank window's input to the ≤ 2·|probs|
      // tiles that actually hold a wanted order statistic — every other
      // tile is never sorted at all. Safe because ranks are tile-LOCAL:
      // dropping whole tiles cannot shift a surviving tile's numbering.
      val wantedPids = located.map(_._2).distinct
      val wanted = located.map { case (_, pid, rn) =>
        col("__pid") === pid && col("__rn") === rn
      }.reduce(_ || _)
      val w = Window.partitionBy("__pid").orderBy("__x")
      val picked = tiled.filter(col("__pid").isin(wantedPids: _*))
        .withColumn("__rn", row_number().over(w))
        .filter(wanted).select("__pid", "__rn", "__x")
        .collect().map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getDouble(2))
        .toMap
      val byRank = located.map { case (r, pid, rn) => r -> picked((pid, rn)) }.toMap
      hs.map { h =>
        val lo = byRank(math.floor(h).toLong)
        val hi = byRank(math.ceil(h).toLong)
        if (math.floor(h) == math.ceil(h)) lo
        else (math.ceil(h) - h) * lo + (h - math.floor(h)) * hi
      }
    } finally tiled.unpersist()
  }

  /** EXACT WEIGHTED quantiles — the inverted-CDF definition: for each p,
    * the smallest value whose cumulative weight reaches p·W (W = total
    * weight). The curation use is token- or byte-weighted corpus stats
    * ("the median document BY TOKENS is 4k chars long" — very different
    * from the median document when a few giants hold half the mass),
    * and importance-weighted calibration cuts.
    *
    * Same distributed-rank-selection shape as [[exactQuantiles]], with
    * COUNTS replaced by WEIGHT SUMS: the column first collapses to one
    * row per DISTINCT value (partial-agg'd — ties merge their weight, so
    * the tiled table is bounded by |distinct|), tiles on driver-computed
    * literal boundaries, per-tile weight totals become global base
    * offsets, and only the ≤ |probs| tiles holding a target ever run the
    * cumulative window. Integer weights end to end — the only float is
    * the p·W target, ceil'd identically by any engine.
    *
    * NULL values and non-positive weights are excluded (a zero-weight
    * row cannot move an inverted CDF; a negative weight has no quantile
    * meaning). All-excluded input → NaN per prob, like [[exactQuantiles]]
    * on empty input.
    *
    * `wCol` must be an INTEGRAL column — enforced, not coerced: a silent
    * cast would floor fractional importance weights (0.9 → 0 → row
    * dropped entirely). Fractional weights should be pre-quantized to a
    * fixed grid by the caller (milli-units, the [[graft.ml.Doremi]]
    * convention), which also keeps the cumulative sums exact.
    */
  def weightedQuantiles(df: DataFrame, xCol: String, wCol: String,
      probs: Seq[Double]): Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    require(probs.nonEmpty, "probs must be non-empty")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0, 1], got $probs")
    val wType = df.schema(wCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(wType),
      s"weight column $wCol must be integral (got $wType) — quantize " +
        "fractional weights to a fixed grid (e.g. milli-units) first")
    val vals = df
      .select(col(xCol).cast("double").as("__x"),
        col(wCol).cast("long").as("__w"))
      .filter(col("__x").isNotNull && col("__w") > 0)
      .groupBy("__x").agg(sum(col("__w")).as("__w"))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = graft.ml.Eval.tileBoundaries(vals, col("__x"), parts)
    val tiled = vals.withColumn("__pid",
      graft.ml.Eval.tilePid(col("__x"), bounds))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = tiled.groupBy("__pid").agg(sum(col("__w")).as("__n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val totalW = sizes.map(_._2).sum
      if (totalW == 0) return probs.map(_ => Double.NaN)
      // Target cumulative weights, floored at 1 so p = 0 means "the
      // smallest value" rather than an empty predicate.
      val targets = probs.map(p =>
        math.max(1L, math.ceil(p * totalW).toLong)).distinct
      val bases = sizes.scanLeft(0L)(_ + _._2).init
      // Tile holding target T: the last whose exclusive base is < T.
      val located = targets.map { t =>
        val i = sizes.indices.findLast(i => bases(i) < t).get
        (t, sizes(i)._1, bases(i))
      }
      val wantedPids = located.map(_._2).distinct
      val w = Window.partitionBy("__pid").orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, 0L)
      val cum = tiled.filter(col("__pid").isin(wantedPids: _*))
        .withColumn("__cum", sum(col("__w")).over(w))
      // One aggregate row answers every target: min value in the
      // target's tile whose global cumulative weight reaches it.
      val answers = cum.agg(
        located.head match { case (t, pid, base) =>
          min(when(col("__pid") === pid && col("__cum") >= t - base,
            col("__x"))).as("t0") },
        located.tail.zipWithIndex.map { case ((t, pid, base), i) =>
          min(when(col("__pid") === pid && col("__cum") >= t - base,
            col("__x"))).as(s"t${i + 1}") }: _*)
        .head()
      val byTarget = located.indices.map(i =>
        located(i)._1 -> answers.getDouble(i)).toMap
      probs.map(p => byTarget(math.max(1L, math.ceil(p * totalW).toLong)))
    } finally tiled.unpersist()
  }

  /** Adds `q_bucket` (0..probs.length): the number of `probs` quantile
    * boundaries strictly below the row's `xCol`.
    *
    * `exact = true` resolves the boundaries EAGERLY via
    * [[exactQuantiles]] (distributed rank selection — no single-reducer
    * percentile) and bands rows against literal boundaries in one
    * map-only projection. The approx path stays fully lazy: a mergeable
    * percentile_approx sketch pass, boundaries broadcast back.
    */
  def bucketize(df: DataFrame, xCol: String, probs: Seq[Double],
      exact: Boolean): DataFrame = {
    if (exact) {
      val qs = exactQuantiles(df, xCol, probs)
      val bucket = qs.foldLeft(lit(0)) { (acc, q) =>
        acc + (col(xCol) > lit(q)).cast("int")
      }
      df.withColumn("q_bucket", bucket)
    } else {
      val ps = array(probs.map(lit): _*)
      val bounds = df.agg(percentile_approx(col(xCol), ps, lit(10000)).as("__qs"))
      val bucket = probs.indices.foldLeft(lit(0)) { (acc, i) =>
        acc + (col(xCol) > col("__qs").getItem(i)).cast("int")
      }
      df.crossJoin(broadcast(bounds))
        .withColumn("q_bucket", bucket)
        .drop("__qs")
    }
  }

  /** Per-group variant — "which quartile of ITS CATEGORY is this row in":
    * boundaries per `groupCols` from one aggregate pass, broadcast-joined
    * back (the boundary table is #groups rows), then the same map-only
    * banding. The fact table still never sorts globally or per group.
    *
    * Contract: rows with a NULL group key are DROPPED (the boundary join
    * is null-unsafe — a quantile of an undefined category is undefined);
    * filter or fill group keys upstream if every row must survive.
    * [[bucketize]] (the global variant) keeps all rows.
    */
  def bucketizeByGroup(df: DataFrame, xCol: String, groupCols: Seq[String],
      probs: Seq[Double], exact: Boolean): DataFrame = {
    val bounds =
      if (exact) groupBoundsExact(df, xCol, groupCols, probs)
      else df.groupBy(groupCols.map(col): _*)
        .agg(percentile_approx(col(xCol), array(probs.map(lit): _*),
          lit(10000)).as("__qs"))
    val bucket = probs.indices.foldLeft(lit(0)) { (acc, i) =>
      acc + (col(xCol) > col("__qs").getItem(i)).cast("int")
    }
    df.join(broadcast(bounds), groupCols)
      .withColumn("q_bucket", bucket)
      .drop("__qs")
  }

  /** Per-group exact quantile_cont boundaries WITHOUT Spark's
    * `percentile` aggregate: `percentile` buffers every group member in
    * its aggregation buffer (an OOM at the first million-row group),
    * while this runs a per-group rank window — a SPILLABLE sort — keeps
    * only the ≤ 2·|probs| order statistics each group's interpolation
    * needs, and folds them to one boundary-array row per group. The
    * needed ranks depend on the group's size, so sizes broadcast-join
    * back onto the ranked rows before the rank filter. Same IEEE
    * interpolation tree as `percentile` / `quantile_cont` — bitwise-
    * identical boundaries, different (memory-safe) plan.
    *
    * Output: (groupCols*, __qs ARRAY<DOUBLE>). Rows with a NULL group
    * key or NULL value are dropped (the [[bucketizeByGroup]] contract).
    */
  private[graft] def groupBoundsExact(df: DataFrame, xCol: String,
      groupCols: Seq[String], probs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val vals = df
      .select(gs :+ col(xCol).cast("double").as("__x"): _*)
      .filter(col("__x").isNotNull &&
        groupCols.map(col(_).isNotNull).reduce(_ && _))
    val w = Window.partitionBy(gs: _*).orderBy(col("__x"))
    val ranked = vals.withColumn("__rn",
      (row_number().over(w) - 1).cast("double"))
    val counts = vals.groupBy(gs: _*).agg(count(lit(1)).as("__n"))
    def h(p: Double): Column = (col("__n") - 1).cast("double") * lit(p)
    val needed = probs.map(p =>
      col("__rn") === floor(h(p)) || col("__rn") === ceil(h(p))).reduce(_ || _)
    val aggs = probs.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        max(when(col("__rn") === floor(h(p)), col("__x"))).as(s"__lo_$i"),
        max(when(col("__rn") === ceil(h(p)), col("__x"))).as(s"__hi_$i"),
        max(ceil(h(p)) - h(p)).as(s"__cf_$i"),
        max(h(p) - floor(h(p))).as(s"__f_$i"))
    }
    // Same lerp tree as `percentile`/`quantile_cont` (see exactQuantiles):
    // (⌈h⌉−h)·lo + (h−⌊h⌋)·hi, collapsing to lo when h is integral.
    // NO broadcast hint on the counts join: one row per GROUP can be
    // arbitrarily large (high-cardinality groupings are exactly where
    // this exact path matters), and a forced broadcast bypasses
    // autoBroadcastJoinThreshold straight into the 8 GB relation cap.
    // Both sides arrive hash-partitioned on the group key (the window
    // and the groupBy), so Catalyst/AQE picks a co-partitioned join —
    // or a broadcast on its own when counts really is small.
    ranked.join(counts, groupCols)
      .filter(needed)
      .groupBy(gs: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(gs :+ array(probs.indices.map(i =>
        when(col(s"__f_$i") === 0.0, col(s"__lo_$i"))
          .otherwise(col(s"__cf_$i") * col(s"__lo_$i") +
            col(s"__f_$i") * col(s"__hi_$i"))): _*)
        .as("__qs"): _*)
  }
}
