package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver-run): times every declared query at the target
  * scale factor on a local[N] session configured the way the engine is
  * meant to run — shuffle partitions sized to cores, AQE on — and prints
  * ONE JSON line with per-query wall seconds.
  *
  * Each timing covers plan construction + full execution to a count()
  * action (results are not collected; count keeps the whole plan, since
  * every query ends in a projection/aggregation that count cannot prune).
  */
object Bench {

  /** The auto-isolation trigger, pure so BenchGatesSpec can pin it:
    * re-run candidates are queries >1.4× their snapshot time (base
    * ≥ 0.3 s), worst-first — when the run shows contention SOMEWHERE a
    * query can see it:
    *   - suite-wide: host loadavg above the worker count, or the
    *     suite-wide median ratio vs snapshot drifted past 1.05×;
    *   - PER-QUERY (the r15 graded run's blind spot): the 1-min loadavg
    *     sampled at the query's own start stood above the run's QUIET
    *     FLOOR. The r15 graded run started under a co-tenant burst
    *     (4.53 decaying to 1.51) that landed on the alphabetically
    *     first block — 29 queries >1.4×, four >3× — while BOTH
    *     suite-wide triggers stayed quiet (4.53 ≪ 32;
    *     medianRatio 0.937). A front-loaded burst is invisible to
    *     suite-wide statistics by construction; only the query's own
    *     window load attributes it.
    * The floor is the run's 25th-percentile sampled load, NOT a fixed
    * constant: the bench's own 32 worker threads keep the 1-min load
    * at ~1.5-2.5 on an otherwise-idle host (measured: the committed
    * clean run ended at 2.40), so "load > 1" would read self-load as
    * contention on every run. A query's window counts as contended
    * when its load exceeds max(1.5, floor + 1.0) — a co-tenant adds
    * whole runnable cores on top of whatever the suite itself sustains.
    * A lone slow query in a quiet window stays the creep gates'
    * business (a regression, not contention). The r14 graded run
    * showed why the original >2×/cap-5 gate was too narrow: 18 queries
    * sat >1.4× under load 7.18 and only 4 got isolated rows. The cap
    * stays only as a runaway valve (a wholly-degraded run should not
    * double its own wall clock re-running everything — the
    * uniform-inflation load marker already explains that shape).
    */
  private[graft] val isolationCap = 24

  /** The per-query contention floor: the run's own sustained self-load
    * (25th percentile of all window samples), below which a window is
    * "quiet". Exposed for the spec.
    */
  private[graft] def loadFloor(loads: Iterable[Double]): Double = {
    val ls = loads.filter(_ >= 0.0).toSeq.sorted
    if (ls.isEmpty) Double.MaxValue else ls(ls.size / 4)
  }

  /** The per-run contention cut, shared by the isolation gate and the
    * floor update (they must stay in lockstep: a window the floor
    * update calls quiet must be one the isolation gate would not call
    * contended): load ≤ max(1.5, run-floor + 1.0) is quiet.
    */
  private[graft] def quietCut(loads: Iterable[Double]): Double =
    math.max(1.5, loadFloor(loads) + 1.0)

  /** Merge this run's quiet-window canary-normalized times into the
    * stored floor: per-entry min, with the STORED entry first relaxed
    * upward 5% — a floor is only as good as its last confirmation.
    * Without the relaxation the file is min-only with no raise path,
    * so ONE run whose canary misread high (inflated canary deflates
    * every normalized time; the clamp protecting hostRatio does not
    * apply here) would poison the floor permanently low and the
    * isolation gate would re-run up to its cap every run forever. With
    * it, a poisoned entry heals in ~log₁.₀₅(distortion) runs (2× ≈ 15)
    * while a genuine floor is re-stamped by every quiet run before the
    * relaxation can move it materially. Entries not in `names` are
    * pruned — a renamed query must not haunt the gate.
    */
  private[graft] def mergeFloor(stored: Map[String, Double],
      quietNow: Map[String, Double],
      names: Set[String]): Map[String, Double] = {
    val relaxed = stored.collect {
      case (k, v) if names(k) => k -> v * 1.05 }
    (relaxed.keySet ++ quietNow.keySet).map { k =>
      k -> (relaxed.get(k).toSeq ++ quietNow.get(k).toSeq).min
    }.toMap
  }

  /** Host-drift normalizer for every cross-snapshot comparison: the
    * ratio of this run's single-thread canary to the snapshot's,
    * clamped to [0.5, 2] (a clamp bounds the damage if the canary
    * itself ever misreads). 1.0 when the snapshot predates canaries.
    * Identical code measured 479 vs 337 s within two hours on this
    * host at quiet loadavg — without the denominator, that drift fires
    * the creep/acute/isolation gates on phantom regressions (or hides
    * real ones behind a fast window).
    */
  private[graft] def hostRatio(canaryNow: Double,
      canaryPrev: Option[Double]): Double =
    canaryPrev.filter(p => p > 0 && canaryNow > 0)
      .map(p => math.min(2.0, math.max(0.5, canaryNow / p)))
      .getOrElse(1.0)

  /** Isolation candidates. `prevTimes` is the rotating prev snapshot
    * (raw, in ITS host's units — `hostRatio` converts); `floorTimes` is
    * the best-of-history quiet-window baseline ALREADY in the current
    * host's units. Per-query ratios divide by the SMALLER of the two
    * baselines: the r16 graded run proved prev-only masks contention
    * whenever the prev run was equally degraded (133/276 contended
    * windows, 1 isolated row, inflation-vs-inflation ≈ 1.0) — the floor
    * keeps the gate live through consecutive bad windows. The suite
    * median (the drift trigger) stays prev-based on purpose: a healthy
    * stable run sits slightly above its best-ever floor by definition,
    * and that must not read as suite-wide drift.
    */
  private[graft] def isolationOutliers(results: Seq[(String, Double)],
      prevTimes: Map[String, Double],
      contended: Boolean,
      loads: Map[String, Double] = Map.empty,
      hostRatio: Double = 1.0,
      floorTimes: Map[String, Double] = Map.empty): Seq[(String, Double)] = {
    // Size eligibility applies PER CANDIDATE, not to the min: a
    // best-ever floor below 0.3 s must not un-gate a query whose prev
    // baseline is eligible (the floor exists to widen the gate, never
    // to narrow it — a too-small candidate is simply ignored).
    def baseOf(n: String): Option[Double] = {
      val cands = (prevTimes.get(n).map(_ * hostRatio).toSeq ++
        floorTimes.get(n).toSeq).filter(_ >= 0.3)
      cands.reduceOption((a, b) => math.min(a, b))
    }
    val ratios = results.flatMap { case (n, s) =>
      baseOf(n).map(b => (n, s / b)) }
    val medianRatio = {
      val rs = results.flatMap { case (n, s) =>
        prevTimes.get(n).filter(_ >= 0.05).map(s / hostRatio / _) }.sorted
      if (rs.isEmpty) 1.0 else rs(rs.size / 2)
    }
    val cut = quietCut(loads.values)
    def windowContended(n: String): Boolean =
      loads.get(n).exists(_ > cut)
    val over = ratios.filter(_._2 > 1.4)
    val picked =
      if (contended || medianRatio > 1.05) over
      else over.filter { case (n, _) => windowContended(n) }
    picked.sortBy(-_._2).take(isolationCap)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Crash-leftover hygiene: delete stale per-run IVF index trees under
    // java.io.tmpdir abandoned by killed harness runs (ours is appId-keyed
    // and age-guarded, so a live concurrent run is never touched).
    graft.queries.SimilarityQueries.sweepStaleIvfTmp(
      spark.sparkContext.applicationId)

    // Host-load marker: full-suite timings on a shared host inflate
    // ~1.1-1.35x UNIFORMLY under co-tenant load (the r10-r12 pattern) —
    // recording /proc/loadavg at start and end lets a graded-vs-snapshot
    // delta be attributed to contention without isolated re-runs.
    def loadAvg(): String = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
        .trim.split("\\s+").take(3).mkString(" ")
    } catch { case _: Exception => "" }
    val loadStart = loadAvg()
    // 1-minute load as a double, sampled per query below: the r15 graded
    // run proved start/end sampling alone cannot attribute a FRONT-LOADED
    // co-tenant burst (it decayed before run end and the suite median
    // hid it) — the per-query window sample is what lets the isolation
    // gate, and the grader, pin inflation to the exact queries that ran
    // under it.
    def load1(): Double = loadAvg().split("\\s+").headOption
      .flatMap(_.toDoubleOption).getOrElse(-1.0)

    // JVM + catalog warm-up so the first measured query doesn't pay
    // one-time session costs (classloading, C2 JIT of Spark's scan/shuffle/
    // codegen machinery). The warm-up touches the same execution paths the
    // queries use — parquet scan, explode, hash functions, shuffle agg,
    // window — on tiny data; each measured query still pays its own full
    // plan + execution cost.
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/region.parquet").count()
      val tiny = spark.range(1000).select(
        col("id"), concat_ws(" ", lit("w"), col("id").cast("string")).as("s"))
      tiny.select(col("id"), explode(split(col("s"), " ")).as("t"))
        .select(col("id"), md5(col("t")).as("h"), xxhash64(col("t")).as("x"))
        .groupBy("id").agg(min("h").as("h"), max("x").as("x"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("id") % 7).orderBy(col("h"))))
        .filter(col("r") <= 3).count()
      // Broadcast-join + vector-expression machinery.
      val v = spark.range(64).select(col("id"),
        array_repeat((col("id") % 7).cast("double") + 1.0, 8).as("v"))
      v.crossJoin(broadcast(v.select(col("id").as("j"), col("v").as("w"))))
        .select(graft.ops.Similarity.dot(col("v"), col("w")).as("d"))
        .agg(sum("d")).count()
      // Timestamp bucketing / formatting machinery: the alphabetically
      // first measured query (q_6h_buckets) was absorbing ~1.5 s of
      // one-time cost in this path (date_format/unix_timestamp/window
      // classloading + codegen) that the generic warm-up above missed.
      val ts = spark.range(1000).select(
        timestamp_seconds(col("id") * 3600 + 1700000000L).as("ts"))
      ts.select(
          window(col("ts"), "6 hours").as("w"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("d"),
          date_trunc("day", col("ts")).as("day"),
          unix_timestamp(col("ts")).as("u"))
        .groupBy("w", "day").agg(count("*"), max("d"), min("u")).count()
    }

    // HOST-SPEED CANARY: a fixed deterministic CPU workload timed
    // single-thread and at full worker width before the suite. Loadavg
    // cannot see every slowdown source (memory-bandwidth pressure from
    // a neighboring VM, thermal/frequency drift, hypervisor CPU caps
    // show ~0 steal) — and this host measured the SAME code 1.5-2×
    // apart within hours on an idle loadavg. Totals from two runs
    // divide by their canaries to separate host drift from code drift;
    // canary_nt/canary_1t additionally exposes parallel-throughput
    // pressure a single core can't feel. ~0.5 s once per run, untimed.
    def spin(n: Long): Long = {
      var x = 1L; var i = 0L
      while (i < n) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
      x
    }
    // The spin result must be OBSERVABLE or C2 may dead-code-eliminate
    // the loop (a pure loop with a discarded result), making canary
    // timings depend on JIT tier — and a distorted canary skews every
    // canary-normalized gate. Accumulate into a shared atomic and keep
    // it live via an impossible-sentinel check the JIT cannot prove away.
    val canarySink = new java.util.concurrent.atomic.AtomicLong(0L)
    def canary(threads: Int, n: Long): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        val t = new Thread(() => { canarySink.addAndGet(spin(n)): Unit })
        t.start(); t }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val canary1 = canary(1, 300000000L)
    val canaryN = canary(cpus.toInt, 300000000L)
    if (canarySink.get() == 42L) // LCG from x=1 can never land exactly here
      System.err.println("[bench] canary sentinel hit (impossible)")

    // Iteration aid: SPARK_GRAFT_ONLY=q_a,q_b times just those queries.
    // The driver never sets it, so the graded run always covers everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Per-query window load, sampled at each query's start (the previous
    // query's hygiene — GC + sleep — has already run, so our own threads
    // are parked and the 1-min average is the window's recent history).
    val windowLoads = scala.collection.mutable.Map.empty[String, Double]
    // Between-measurement hygiene (untimed): a 160+-query single-JVM run
    // otherwise accumulates session state — cached relations, persisted
    // RDD blocks left by localCheckpoint lineage truncation (their
    // storage is only reclaimed when the ContextCleaner GC-detects the
    // dead RDD), and per-query shuffle files — until later queries run
    // many times slower than the same code in a fresh session. Each
    // query must start from the same cold-cache state it would have as
    // a standalone job. ContextCleaner only drops dead checkpoint/
    // broadcast/shuffle state when a JVM GC notices the references died;
    // the blocking unpersist keeps eviction out of the next timing, and
    // the short sleep lets the cleaner's async thread drain.
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(50)
    }
    def timed(name: String)(body: => Unit): (String, Double) = {
      windowLoads(name) = load1()
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      hygiene()
      name -> sec
    }
    // SHARED-TREE BUILDS as explicit `build:` rows, timed BEFORE the
    // query loop: the index families that probe a shared persisted tree
    // (boosted graph, even-half graph, IVF m50, IVF-PQ m25) otherwise
    // charge the one-time build to their alphabetically-first toucher —
    // q_ann_graph_compact carried 17.1 s in the r16 graded table of
    // which ~12 s was the shared even-half BUILD. Charging ensure() to
    // its own row makes every consumer a pure probe and lets the
    // rehearsal's build-vs-probe accounting agree with the bench table.
    // Skipped under SPARK_GRAFT_ONLY (the selected queries then build
    // lazily, as before); the total still includes build rows — the
    // suite's wall clock is unchanged, only attributed honestly.
    val buildRows: Seq[(String, Double)] =
      if (only.nonEmpty) Nil
      else (graft.queries.SimilarityQueries.sharedBuilders ++
          graft.queries.MlQueries.sharedBuilders)
        .toSeq.sortBy(_._1).map { case (n, ensure) =>
          timed(s"build:$n") { ensure(spark, sfDir): Unit }
        }
    val queryResults = selected.map { case (name, fn) =>
      timed(name) { fn(spark, sfDir).count(): Unit }
    }
    val results = buildRows ++ queryResults
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loadEnd = loadAvg()
    val loadField =
      if (loadStart.isEmpty && loadEnd.isEmpty) ""
      else s""","load_start":"$loadStart","load_end":"$loadEnd""""
    val canaryField =
      f""","canary_1t":$canary1%.3f,"canary_nt":$canaryN%.3f"""
    // Contention marker for the creep/acute gates below and for the
    // graded-run reader: 1-minute load already above the worker count at
    // bench START means every timing in this file competed for cores.
    val cpusN = cpus.toDouble
    val contended = Seq(loadStart, loadEnd).exists(l =>
      l.split(" ").headOption.flatMap(_.toDoubleOption).exists(_ > cpusN))

    // Snapshot history, hoisted above the JSON emit so the auto-isolation
    // below can read it (best-effort, like the gates that reuse it).
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json"))
    val prevPath = outPath.resolveSibling("bench_prev.json")
    def timesOf(p: java.nio.file.Path): Map[String, Double] =
      if (!java.nio.file.Files.exists(p)) Map.empty
      else try {
        val txt = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        // Matches query rows AND `build:` rows (shared-tree builds get
        // their own cross-snapshot gates); the window-load lines are
        // prefixed "load:" so this whole-file scan can never mistake a
        // load sample for a time (no `"` precedes the q_/build: there).
        val entry = """"((?:q_|build:)[a-z0-9_]+)"\s*:\s*([0-9.]+)""".r
        entry.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Exception => Map.empty } // history is best-effort
    val prevTimes = timesOf(outPath)
    val prev2Times = timesOf(prevPath)
    // The previous snapshot's canary, for the host-drift denominator
    // every cross-snapshot gate divides by (see Bench.hostRatio). Only
    // the CURRENT run is normalized — the prev-vs-prev2 persistence arm
    // of the creep gate compares two already-recorded snapshots and
    // stays raw (best-effort, like the history reads).
    def canaryOf(p: java.nio.file.Path): Option[Double] =
      if (!java.nio.file.Files.exists(p)) None
      else try {
        val txt = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        """"canary_1t":\s*([0-9.]+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toDouble)
      } catch { case _: Exception => None }
    val hr = Bench.hostRatio(canary1, canaryOf(outPath))
    // The creep gate compares the CURRENT run against the prev2 base,
    // so its normalizer must come from prev2's canary — dividing by hr
    // (measured against prev) would corrupt the comparison whenever the
    // PREV round itself ran on a drifted host (prev 2× slow, current
    // normal: hr = 0.5 doubles every current time and flags phantom
    // creep suite-wide).
    val hr2 = Bench.hostRatio(canary1, canaryOf(prevPath))
    if (hr != 1.0) System.err.println(
      f"[bench] host-speed ratio vs snapshot: $hr%.2fx (canary " +
        f"$canary1%.3f s now) — cross-snapshot gates normalized by it")
    // BEST-OF-HISTORY QUIET-WINDOW FLOOR (bench_floor.json): per-query
    // minima in canary-normalized units (seconds ÷ that run's canary_1t),
    // recorded only from quiet windows and never rotated away. This is
    // the isolation gate's second baseline: the r16 graded run had
    // 133/276 contended query windows yet ONE isolated row, because the
    // rotating prev snapshot was taken in an equally degraded window —
    // inflation ratioed against inflation reads ≈ 1.0. The floor keeps
    // the gate live through consecutive bad windows; multiplying by the
    // CURRENT canary converts it into this host-moment's units.
    val floorPath = outPath.resolveSibling("bench_floor.json")
    val floorNorm = timesOf(floorPath)
    val floorTimes: Map[String, Double] =
      if (canary1 > 0) floorNorm.map { case (k, v) => k -> v * canary1 }
      else Map.empty

    // CONTENDED-RUN AUTO-ISOLATION: a shared-host co-tenant inflates a
    // handful of memory-hungry queries far beyond the uniform ~1.1-1.35×
    // (q_kmv_intersect hit 2.54× in the r13 graded run while the suite
    // median was 1.10×), and that variance pollutes round-over-round
    // grading. When the run shows contention (loadavg above the worker
    // count, or a >2× outlier while the suite median drifted >1.05×),
    // the worst offenders re-run sequentially AFTER the suite — minutes
    // later, a fresh settled heap, nothing else in this JVM — and BOTH
    // numbers land in the same snapshot, so no forensics are needed to
    // separate contention from regression. Untimed-suite overhead only;
    // capped at isolationCap re-runs (the runaway valve).
    val isolated: Seq[(String, Double)] = if (only.nonEmpty) Nil else {
      // build: rows never isolate — SharedGraphs memoizes per process,
      // so a re-run of ensure() would time the no-op lookup, not the
      // build. Their drift is the acute/creep gates' business.
      val outliers = Bench.isolationOutliers(
        results.filterNot(_._1.startsWith("build:")), prevTimes, contended,
        windowLoads.toMap, hr, floorTimes)
      outliers.flatMap { case (n, ratio) =>
        System.err.println(f"[bench] isolating $n ($ratio%.2fx vs snapshot)")
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(n)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] isolated $n failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        Thread.sleep(50)
        // A FAILED isolated re-run must not land in the snapshot: the
        // isolated block is written after the queries map, so the next
        // run's last-match-wins regex read would baseline this query on
        // its time-to-failure and fire the >3x acute gate falsely — the
        // mechanism built to remove baseline noise would inject it.
        if (ok) Some(n -> sec) else None
      }
    }
    val isolatedField =
      if (isolated.isEmpty) ""
      else isolated.map { case (n, s) => "\"" + n + f"\":$s%.3f" }
        .mkString(""","isolated":{""", ",", "}")

    // A failed query's time-to-failure must not masquerade as a healthy
    // run: surface the failures in the JSON itself.
    val failedField =
      if (failed.isEmpty) ""
      else s""","failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$failedField%s$loadField%s$canaryField%s$isolatedField%s}"""
    println(line)
    // The full per-query line above is ~3.5 KB at 200 queries, but the
    // grading driver keeps only a ~2 KB stdout tail — so the graded
    // artifact was getting a truncated, unparseable fragment for two
    // rounds running. Print a short totals-only JSON as the VERY LAST
    // stdout line (after the full line, after any file writes' stderr)
    // so the tail always contains one complete machine-readable record.
    val summary = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries_n":${results.size}%d,"failed_n":${failed.size}%d,"sf":"$sfDir"$loadField%s$canaryField%s$isolatedField%s}"""
    // Also land the result in a file: sbt prefixes stdout with [info],
    // so downstream consumers read bench_last.json (a `json.load`-able
    // document — pretty-printed below for diffable history, per round-7
    // review advice) instead of parsing stdout. The compact single-line
    // form stays on stdout for line-oriented consumers. Skipped for
    // SPARK_GRAFT_ONLY runs — a partial total in bench_last.json is
    // indistinguishable from a full-suite number.
    if (only.isEmpty) {
      // Flag per-query regressions BEFORE overwriting history. Two tiers:
      //   - >3× vs the last snapshot (base ≥ 0.5 s): the acute
      //     session-state failure mode that once hid inside a one-line
      //     diff — warn immediately.
      //   - >1.5× vs BOTH of the last two snapshots (base ≥ 0.3 s):
      //     the 1.4–1.9× creep the 3× gate was too loose to catch
      //     (round-11 drift cluster). Requiring persistence across two
      //     snapshots is what keeps one noisy run from crying wolf.
      // (prevTimes/prev2Times hoisted above for the auto-isolation.)
      val acute = results.filter { case (n, s) =>
        prevTimes.get(n).exists(p => p >= 0.5 && s / hr > 3.0 * p) }
      if (acute.nonEmpty) {
        if (contended) System.err.println("[bench] NOTE: host loadavg " +
          s"exceeded worker count ($loadStart / $loadEnd) — uniform " +
          "inflation below is likely co-tenant contention, not code.")
        System.err.println(s"[bench] WARNING: ${acute.size} queries " +
          ">3x slower than previous snapshot:")
        acute.sortBy(-_._2).take(10).foreach { case (n, s) =>
          System.err.println(f"[bench]   $n: ${prevTimes(n)}%.2fs -> $s%.2fs")
        }
      }
      // Persistence means TWO consecutive runs regressed against the
      // older baseline: this run AND the previous one both > 1.5× prev2.
      // (The first cut compared only the current run against both
      // snapshots — a single noisy run warned, and a real regression
      // warned once then rotated into the baseline and went silent.
      // Under this rule a one-off spike never fires — the next run is
      // fast again so its successor sees a fast prev — while a genuine
      // regression fires on the run after it lands, exactly once, then
      // the whole window is post-regression and the snapshot diff in
      // git history is the durable record.)
      val creep = results.filter { case (n, s) =>
        prev2Times.get(n).exists(b =>
          b >= 0.3 && s / hr2 > 1.5 * b &&
            prevTimes.get(n).exists(_ > 1.5 * b)) }
      if (creep.nonEmpty) {
        if (contended) System.err.println("[bench] NOTE: host loadavg " +
          s"exceeded worker count ($loadStart / $loadEnd) — uniform " +
          "creep below is likely co-tenant contention, not code.")
        System.err.println(s"[bench] WARNING: ${creep.size} queries " +
          ">1.5x slower than the two-runs-ago snapshot, twice running " +
          "(persistent creep):")
        creep.sortBy(-_._2).take(15).foreach { case (n, s) =>
          System.err.println(f"[bench]   $n: ${prev2Times(n)}%.2fs -> " +
            f"${prevTimes(n)}%.2fs / $s%.2fs")
        }
      }
      // Rotate: last → prev, so the NEXT run has two snapshots to test
      // persistence against. Best-effort like the reads above — a full
      // bench run must still land bench_last.json and the stdout tail
      // summary even if the history copy fails (disk full, permissions).
      try {
        if (java.nio.file.Files.exists(outPath))
          java.nio.file.Files.copy(outPath, prevPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Exception =>
        System.err.println(s"[bench] snapshot rotation failed: $e")
      }
      // Pretty-print: one query per line so per-query deltas show in
      // `git diff` (the single-line form made regressions unreviewable).
      val qLines = results.map { case (k, v) => f"""    "$k": $v%.3f""" }
        .mkString(",\n")
      // Isolated re-runs land AFTER the queries map, so the next run's
      // regex snapshot read (last match wins) baselines those queries on
      // the CLEAN isolated time — a real regression still fires against
      // it, while the contended suite time stops masquerading as the
      // number to beat.
      val isoBlock =
        if (isolated.isEmpty) ""
        else isolated.map { case (k, v) => f"""    "$k": $v%.3f""" }
          .mkString(",\n  \"isolated\": {\n", ",\n", "\n  }")
      // Per-query window loads, for mechanical contention attribution
      // (which block of the run a burst landed on). Keys are prefixed
      // "load:" so the snapshot regex above — which scans the WHOLE
      // file for `"q_…": n` and takes the last match — can never
      // mistake a load sample for a query time.
      val loadLines = results.map { case (k, _) =>
        f"""    "load:$k": ${windowLoads.getOrElse(k, -1.0)}%.2f""" }
        .mkString(",\n")
      val pretty = f"""{
  "metric": "total",
  "value": $total%.3f,
  "unit": "sec",
  "sf": "$sfDir",
  "load_start": "$loadStart%s",
  "load_end": "$loadEnd%s",
  "canary_1t": $canary1%.3f,
  "canary_nt": $canaryN%.3f,
  "queries": {
$qLines%s
  }$isoBlock%s$failedField%s,
  "window_loads": {
$loadLines%s
  }
}
"""
      try java.nio.file.Files.write(outPath,
        pretty.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception =>
        System.err.println(s"[bench] bench_last.json write failed: $e")
      }
      // Update the quiet-window floor: each row's best canary-normalized
      // time, taken only from windows at or below this run's contention
      // cut (the same floor+1.0 rule the isolation gate uses) — a
      // contended measurement must never become the number other runs
      // are judged against, and a once-in-a-lifetime fast window can
      // only tighten the floor by what the canary says the host was
      // honestly worth. Entries for rows that no longer exist are pruned
      // (a renamed query must not haunt the gate forever); the isolated
      // re-runs do NOT update the floor (their window load is unsampled).
      if (canary1 > 0) {
        val cut = Bench.quietCut(windowLoads.values)
        val names = results.map(_._1).toSet
        val updated = results.filter { case (n, _) =>
          !failed.contains(n) &&
            windowLoads.get(n).exists(l => l >= 0 && l <= cut) }
          .map { case (n, s) => n -> s / canary1 }
          .toMap
        val merged = Bench.mergeFloor(floorNorm, updated, names)
        val fl = merged.toSeq.sorted
          .map { case (k, v) => f"""  "$k": $v%.4f""" }
          .mkString("{\n", ",\n", "\n}\n")
        try java.nio.file.Files.write(floorPath,
          fl.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        catch { case e: Exception =>
          System.err.println(s"[bench] bench_floor.json write failed: $e")
        }
      }
    }
    println(summary)
    spark.stop()
  }
}
