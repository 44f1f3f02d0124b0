package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (backward with forward fallback).
  *
  * Semantics mirror the reference's per-row 3-probe price lookup
  * (`/root/reference/src/2_parse_engine.py:16-63`): for each probe row at
  * time `t`, take the build-side value at the latest build time `<= t`
  * (exact match included); if no earlier build row exists, fall back to the
  * earliest build time `> t`; null when the key has no build rows at all.
  *
  * Spark-first formulation — no native ASOF join exists, so we use the
  * union + window trick instead of a per-row probe or a broadcast N×M range
  * join:
  *
  *   1. union probe and build rows on a shared (key, time) axis, tagging the
  *      side (build sorts before probe at equal timestamps so exact-time
  *      matches are visible to the probe row);
  *   2. one window per direction: `last(value, ignoreNulls)` over
  *      (-inf, current] gives the backward fill, `first(value, ignoreNulls)`
  *      over (current, +inf) gives the forward fallback;
  *   3. `coalesce(backward, forward)`.
  *
  * Scale properties: a single hash-partition shuffle on the join key(s) +
  * an in-partition sort — identical shape to a sort-merge join, no
  * broadcast of the build side required, no row explosion. Skewed hot keys
  * (one item traded daily for years) stay a single partition's sort, which
  * is the same cost profile a native ASOF merge would have. AQE handles
  * residual skew.
  */
object AsOfJoin {

  /** @param probe      left side; one output row per probe row
    * @param build      right side supplying `valueCols`
    * @param keys       equi-join key column names (present on both sides)
    * @param probeTime  event-time column name on `probe`
    * @param buildTime  event-time column name on `build`
    * @param valueCols  build columns to carry to the output
    * @param strategy   "backward" | "forward" | "backward_then_forward"
    */
  def join(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      valueCols: Seq[String],
      strategy: String = "backward_then_forward"): DataFrame = {

    val probeCols = probe.columns.toSeq
    require(valueCols.forall(build.columns.contains), "valueCols must exist on build side")

    // Shared axis: keys ++ __t ++ __is_probe ++ probe payload ++ build payload.
    val p = probe
      .withColumn("__t", col(probeTime))
      .withColumn("__is_probe", lit(1))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__is_probe")) ++
          probeCols.filterNot(keys.contains).map(col) ++
          valueCols.map(c => lit(null).cast(build.schema(c).dataType).as(s"__v_$c")): _*)

    val b = build
      .withColumn("__t", col(buildTime))
      .withColumn("__is_probe", lit(0))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__is_probe")) ++
          probeCols.filterNot(keys.contains)
            .map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
          valueCols.map(c => col(c).as(s"__v_$c")): _*)

    val unioned = p.unionByName(b)

    // Build rows (__is_probe=0) sort before probe rows at equal __t, so an
    // exact-time build value is inside the backward frame of its probe row.
    val ord = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__is_probe"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      val back = last(col(s"__v_$c"), ignoreNulls = true).over(wBack)
      val fwd = first(col(s"__v_$c"), ignoreNulls = true).over(wFwd)
      val v: Column = strategy match {
        case "backward" => back
        case "forward" => fwd
        case _ => coalesce(back, fwd)
      }
      df.withColumn(s"__f_$c", v)
    }

    filled
      .filter(col("__is_probe") === 1)
      .select(probeCols.map(col) ++ valueCols.map(c => col(s"__f_$c").as(c)): _*)
  }

  /** Native-plan variant of [[join]]: constructs a [[graft.plans.AsOfJoinPlan]]
    * logical node, planned by [[graft.plans.AsOfJoinStrategy]] into a
    * co-partitioned sort-merge [[graft.plans.AsOfJoinExec]].
    *
    * Same output contract as [[join]] (probe columns ++ value columns, one
    * row per probe row). Semantic delta, relevant only when value columns
    * can be null: the native node is row-atomic per direction — backward is
    * the nearest earlier build ROW, forward the nearest later build ROW,
    * coalesced per column — exactly DuckDB's two-ASOF-then-COALESCE shape,
    * while [[join]]'s window form skips null VALUES within a direction
    * (`last(..., ignoreNulls)`). With non-null value columns the two are
    * bit-identical (property-checked in AsOfJoinNativeSpec).
    *
    * Why it exists (the 100 TB argument): [[join]] unions both inputs and
    * sorts the union once per window — every build row is padded with every
    * probe column and vice versa, and the single union-wide sort carries
    * that widened row through the shuffle. The native exec shuffles and
    * sorts each side independently at its own width and streams the merge
    * with one small retained row per side.
    */
  def joinNative(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      valueCols: Seq[String],
      strategy: String = "backward_then_forward"): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

    require(valueCols.forall(build.columns.contains), "valueCols must exist on build side")
    val spark = probe.sparkSession
    AsOfJoinStrategy.register(spark)

    val lPlan = GraftColumnBridge.analyzed(probe)
    // Fresh-alias every right attribute so a self-join (probe and build read
    // from the same source) can't alias attribute ids across sides.
    val rAnalyzed = GraftColumnBridge.analyzed(build)
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)

    def attr(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(_.name == name).getOrElse(
        sys.error(s"as-of $side column '$name' not in ${out.map(_.name).mkString(", ")}"))

    val node = AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan.output, _, "probe")),
      keys.map(attr(rPlan.output, _, "build")),
      attr(lPlan.output, probeTime, "probe"),
      attr(rPlan.output, buildTime, "build"),
      valueCols.map(attr(rPlan.output, _, "build")),
      strategy)
    val joined = GraftColumnBridge.ofRows(spark, node)
    // Contract parity with `join`: probe columns then value columns. Select
    // by ATTRIBUTE (node.output is exactly probe attrs ++ value attrs) — a
    // by-name select would throw an ambiguous-reference AnalysisException
    // when a value column shares its name with a probe column.
    joined.select(node.output.map(GraftColumnBridge.column): _*)
  }

  /** Skew-resistant as-of join for a HOT KEY on the probe side — the
    * reference's exact workload shape (a handful of popular items carry
    * most of the event stream, each with a bounded price series).
    *
    * Both as-of physical paths shuffle on the key, so a hot key lands one
    * giant sorted partition; AQE's `OptimizeSkewedJoin` cannot help
    * because it only rewrites `SortMergeJoinExec`/`ShuffledHashJoinExec`,
    * never a custom exec. The standard salting fix applies cleanly here
    * BECAUSE the build side is replicated whole: every salted subgroup
    * sees the key's complete series, so backward, forward, and
    * backward_then_forward all match exactly what the unsalted join
    * produces — no boundary-carry logic needed (contrast with
    * time-bucketed splitting, which must carry the last pre-bucket build
    * row into each bucket; that variant is the answer when the BUILD side
    * itself is huge per key, at which point replication stops being
    * cheap).
    *
    * The salt is `pmod(xxhash64(saltCol), numSalts)` — deterministic,
    * like [[SkewJoin.saltedJoin]]: reruns, retries, and speculative tasks
    * partition identically. `saltCol` must be high-cardinality within
    * each key group (event id, timestamp). Output contract and row set
    * are IDENTICAL to [[join]]/[[joinNative]] (property-gated in
    * AsOfJoinSkewSpec).
    *
    * @param numSalts build-side replication factor = added parallelism
    *                 for the hot key; build grows ×numSalts, so size it
    *                 against the build side's footprint.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      valueCols: Seq[String],
      saltCol: String,
      numSalts: Int = 16,
      strategy: String = "backward_then_forward"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    require(probe.columns.contains(saltCol), s"saltCol '$saltCol' not on probe")
    // The working column must not clobber caller data: the final drop
    // would silently erase a pre-existing __salt from the output,
    // breaking the output-identical-to-join contract.
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "saltedJoin reserves the column name '__salt'; rename it on the input")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col(saltCol)), lit(numSalts.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    joinNative(salted, replicated, keys :+ "__salt", probeTime, buildTime,
      valueCols, strategy)
      .drop("__salt")
  }

  /** What the probe-side key histogram says about skew, and what to do
    * about it. `hot` means the busiest key materially exceeds the rows an
    * average shuffle partition would hold, so the merge exec's sorted
    * partition for that key becomes the straggler.
    *
    * Detection is ADVISORY: both routes produce identical rows
    * (property-gated), so a sampling miss costs performance, never
    * correctness — which is why sampling is safe as the default at scale.
    */
  case class SkewProfile(
      maxKeyRows: Long,
      totalRows: Long,
      avgPartitionRows: Double,
      hot: Boolean,
      suggestedSalts: Int)

  /** Probe-key skew probe: a (sampled) map-side-combined key histogram
    * reduced to two scalars. Reads ONLY the key columns (pruned scan);
    * the shuffle carries one row per distinct sampled key.
    */
  private[graft] def skewProfile(
      probe: DataFrame,
      keys: Seq[String],
      skewFactor: Double = 2.0,
      sampleFraction: Double = 0.05,
      maxSalts: Int = 64): SkewProfile = {
    require(skewFactor > 1.0, s"skewFactor must exceed 1, got $skewFactor")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val keyCols = keys.map(col)
    val base = probe.select(keyCols: _*)
    // Deterministic seed: retries and reruns of the same inputs make the
    // same routing decision.
    val sampled =
      if (sampleFraction >= 1.0) base
      else base.sample(withReplacement = false, sampleFraction, seed = 42L)
    val r = sampled.groupBy(keyCols: _*).count()
      .agg(max(col("count")).as("mx"), sum(col("count")).as("tot"))
      .head()
    val (mx, tot) =
      if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
    val parts =
      probe.sparkSession.sessionState.conf.numShufflePartitions.toDouble
    val avg = if (tot == 0L) 0.0 else tot / parts
    // Skew ratios are scale-invariant, so the sampled histogram compares
    // directly — no inflation back to full-corpus counts needed. The
    // default skewFactor=2 reads: the busiest key ALONE would fill its
    // partition to 2x the fair share — that partition is the straggler
    // whatever else lands on it.
    val hot = tot > 0L && mx > skewFactor * math.max(1.0, avg)
    val salts = math.min(maxSalts.toLong,
      math.max(2L, math.ceil(mx / math.max(1.0, avg)).toLong)).toInt
    SkewProfile(mx, tot, avg, hot, salts)
  }

  /** Self-routing as-of join — the no-opt-in answer to "my probe keys are
    * Zipf and I shouldn't have to know that": picks among the three
    * physical legs automatically.
    *
    *   1. build side under the broadcast threshold → [[joinNative]]
    *      directly (the strategy plans BroadcastAsOfJoinExec; the probe
    *      never shuffles, so probe-key skew cannot hurt — detection would
    *      be a wasted pass);
    *   2. otherwise run [[skewProfile]] over (a sample of) the probe
    *      keys; a hot key routes to [[saltedJoin]] with a derived salt
    *      count that splits the busiest key back to ~average-partition
    *      chunks;
    *   3. no hot key → the co-partitioned merge via [[joinNative]].
    *
    * All three legs are row-identical by contract (AsOfJoinSkewSpec /
    * AsOfJoinAutoSpec), so the detector only ever trades performance.
    * Cost of detection when it runs: one pruned scan of the probe's key
    * columns at `sampleFraction`, map-side combined.
    *
    * @param saltCol salt source when the salted leg fires; defaults to
    *                `probeTime` (high-cardinality within a key by nature)
    */
  def joinAuto(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      valueCols: Seq[String],
      strategy: String = "backward_then_forward",
      saltCol: Option[String] = None,
      skewFactor: Double = 2.0,
      sampleFraction: Double = 0.05,
      maxSalts: Int = 64): DataFrame = {
    val conf = probe.sparkSession.sessionState.conf
    val threshold = conf.autoBroadcastJoinThreshold
    // Same statistic AsOfJoinStrategy consults, read at the same
    // (optimized-logical) altitude — the wrapper's broadcast short-circuit
    // and the strategy's physical pick agree by construction.
    val buildBytes = build.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && buildBytes >= 0 && buildBytes <= BigInt(threshold))
      return joinNative(probe, build, keys, probeTime, buildTime, valueCols,
        strategy)
    val prof = skewProfile(probe, keys, skewFactor, sampleFraction, maxSalts)
    if (prof.hot)
      saltedJoin(probe, build, keys, probeTime, buildTime, valueCols,
        saltCol.getOrElse(probeTime), prof.suggestedSalts, strategy)
    else
      joinNative(probe, build, keys, probeTime, buildTime, valueCols,
        strategy)
  }
}
