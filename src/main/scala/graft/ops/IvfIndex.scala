package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable IVF index: build the codebook + inverted lists ONCE, write
  * them as parquet, and serve any number of probe batches from the stored
  * artifact — the build-once/probe-many shape real retrieval workloads
  * have (the inline [[Similarity.ivfTopKWith]] re-derives assignments on
  * every call, which is right for one-shot analytics and wrong for a
  * query service fielding thousands of probe batches).
  *
  * Layout under `path`:
  *   - `centroids/` — (centroid_id, centroid ARRAY<DOUBLE>, cnorm):
  *     nlist rows, broadcast at probe time. A [[refit]] (which CHANGES
  *     the codebook) instead writes a VERSION-KEYED
  *     `centroids_lists_v{n}` paired with its tree, so codebook and
  *     lists swap atomically under the tree's `_SUCCESS`; readers
  *     resolve via [[centDir]] (keyed-if-present, legacy otherwise),
  *     [[compact]] carries the keyed dir to the compacted tree name,
  *     and [[rollback]] retires it with its tree;
  *   - `lists_v{n}/` (every [[write]] and [[compact]] emits the next
  *     version; a pre-versioning `lists/` tree is still resolvable) —
  *     (neighbor_id, vec, vnorm) PARTITIONED BY `list`: each corpus
  *     vector exactly once, keyed by its Voronoi cell. Readers resolve
  *     the live tree via [[liveLists]] — the highest
  *     `_SUCCESS`-committed version — so both rebuild and compaction
  *     swaps are crash-safe without renames.
  *
  * Why `partitionBy(list)` is the load-bearing choice: the probe join's
  * key IS the partition column, and the probe side (queries × nprobe
  * rows) broadcasts — so Spark's dynamic partition pruning turns each
  * probe batch into a scan of ONLY the probed lists' directories. At
  * nlist=4096 and nprobe=8 a batch touches ~0.2% of the corpus bytes;
  * that multiplier is the entire point of IVF, and it survives here
  * WITHOUT a custom reader because the layout lines up with Spark's own
  * pruning machinery. `repartition(list)` before the write keeps it to
  * one writer per list (no small-files explosion); stored vnorm spares
  * every probe batch the norm recompute.
  *
  * Results are identical to the inline path on the same codebook
  * (spec-gated: IvfIndexSpec, oracle-gated: q_ann_ivf_persist).
  */
object IvfIndex {

  /** Build the index from a corpus and a caller-supplied codebook (pair
    * with [[graft.ml.KMeans.centroidFrame]], or any sampled frame) and
    * persist it under `path` (overwrite).
    *
    * Crash-safety: the fresh list tree is written as the NEXT
    * `lists_v{n+1}` — the same commit path as [[compact]] — so it
    * becomes visible to [[liveLists]] exactly when the committer drops
    * `_SUCCESS`, and stale versions (plus any pre-versioning `lists`
    * tree) are deleted only AFTER that commit. A crash at any point
    * leaves the previous committed tree resolvable; the old
    * delete-then-write order could strand a path with centroids but no
    * list tree at all. Remaining caveat, documented not solved: the
    * centroids/ overwrite is a separate action, so a rebuild that
    * CHANGES the codebook has a window where readers pair new centroids
    * with the old committed lists — cell routing degrades (recall), but
    * every returned row is still a real stored vector with a correct
    * score. Full pair-atomicity needs a manifest; out of scope for a
    * single-writer maintenance job.
    */
  def write(
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      centIdCol: String = "centroid_id",
      centVecCol: String = "centroid",
      maxRecordsPerFile: Long = 5000000L,
      retain: Int = 1): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val cent = Similarity.centFrame(centroids, centIdCol, centVecCol)
    val spark = corpus.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = s"lists_v${maxVersion(fs, root) + 1}"
    // The codebook and lists trees are independent (the model-sized cent
    // frame both read is cheap to evaluate twice) — overlap the writes
    // (guide §2.6). Crash atomicity is unchanged: the commit point was
    // and remains the lists tree's _SUCCESS, and a torn centroids
    // overwrite next to an uncommitted lists tree was already reachable
    // under the sequential order (centroids landed first).
    Par.jobs(
      () => cent.select(col("__cid").as("centroid_id"),
          col("__cv").as("centroid"), col("__cn").as("cnorm"))
        .write.mode("overwrite").parquet(s"$path/centroids"),
      () => Similarity.invertedLists(corpus, idCol, vecCol, cent)
        .select(col("__list").as("list"), col("neighbor_id"),
          col("__nv").as("vec"), col("__nn").as("vnorm"))
        .repartition(col("list"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy("list")
        .parquet(s"$path/$next"))
    // Only now — the new tree is committed and outranks everything —
    // drop superseded trees beyond the retention window. `retain`
    // keeps the newest N COMMITTED trees (default 1 — live only): a
    // retention > 1 buys [[rollback]] of a bad rebuild, and a RETAINED
    // tree keeps its keyed tombstone dir too, because those masks are
    // part of the serving state a rollback must restore (the deletes
    // were intentional, independent of the rebuild being undone).
    // Tombstone dirs are KEYED TO THEIR LIST TREE
    // (`tombstones_lists_v{n}` — see [[delete]]), so readers of the
    // committed new tree never consult a retained tree's masks even
    // without any cleanup; the deletes below are garbage collection,
    // not correctness. (The legacy unversioned `tombstones` dir is
    // always cleared — pre-migration indexes keep the old
    // single-writer caveat until their first rebuild.)
    retireSuperseded(fs, root, path, retain, consumed = Set.empty)
  }

  /** Post-commit cleanup shared by [[write]] and [[compact]]: keep the
    * newest `retain` COMMITTED list trees (with their keyed tombstone
    * dirs — a retained tree's masks are its serving state), delete
    * every other `lists*` tree (torn leftovers included), the legacy
    * unversioned `lists`/`tombstones`, and the tombstone dirs in
    * `consumed` (masks a compaction just folded — kept trees whose
    * masks were consumed roll back to their PRE-delete state, which is
    * exactly the bad-delete-shipped undo [[rollback]] exists for).
    */
  /** Committed `lists_v{n}` tree names under `path`, version-ascending —
    * the ONE definition of "committed" retention, rollback and reads
    * must agree on.
    */
  private def committedTrees(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    (if (fs.exists(root)) fs.listStatus(root).toSeq.map(_.getPath.getName)
     else Seq.empty)
      .filter(_.matches("lists_v\\d+"))
      .filter(n => fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/$n/_SUCCESS")))
      .sortBy(_.stripPrefix("lists_v").toInt)
  }

  private def retireSuperseded(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, path: String, retain: Int,
      consumed: Set[String]): Unit = {
    val keep = committedTrees(fs, path).takeRight(retain).toSet
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n == "lists" || (n.matches("lists_v\\d+") && !keep.contains(n))) ||
        (n.startsWith("centroids_") &&
          !keep.contains(n.stripPrefix("centroids_"))) ||
        (n == "tombstones" ||
          (n.startsWith("tombstones_") &&
            !keep.contains(n.stripPrefix("tombstones_"))) ||
          consumed.contains(n))
      }
      .foreach(p => fs.delete(p, true))
  }

  /** Snapshot `srcPath`'s live state into `dstPath` as an independent
    * single-writer tree — hard-linked when local ([[TreeClone]]), so
    * branching a serving index (experiment/tenant snapshot, or a
    * mutation that must not touch a shared base) is metadata work.
    *
    * Layout-aware clone order, commit-marker LAST: centroids, then the
    * live list tree WITHOUT its `_SUCCESS`, then that tree's pending
    * tombstones (a branch sees exactly the source readers' state), and
    * only then the `_SUCCESS` marker — so a torn branch leaves `dstPath`
    * unresolvable instead of half-committed. The live tree keeps its
    * VERSION NAME in the branch because tombstone dirs are keyed to it
    * (`tombstones_lists_v{n}`).
    */
  def branch(spark: SparkSession, srcPath: String, dstPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val sfs = p(srcPath).getFileSystem(conf)
    val dfs = p(dstPath).getFileSystem(conf)
    // Fresh-snapshot primitive, like [[VersionedTree.branch]]: a dst
    // already holding an index must be refused — a dst whose existing
    // live tree OUTRANKS the cloned one would leave the clone committed
    // but never resolvable, and one that is outranked would silently
    // shadow the dst's own history.
    if (dfs.exists(p(dstPath))) {
      val entries = dfs.listStatus(p(dstPath)).map(_.getPath.getName)
        .filter(n => n == "lists" || n.matches("lists_v\\d+") ||
          n == "centroids")
      require(entries.isEmpty,
        s"branch target $dstPath already holds an IVF index " +
          s"(${entries.mkString(", ")}) — branch snapshots into a " +
          "FRESH tree")
    }
    val live = liveLists(spark, srcPath)
    TreeClone.linkOrCopy(p(s"$srcPath/centroids"),
      p(s"$dstPath/centroids"), conf)
    // A post-refit source pairs its live tree with a version-keyed
    // codebook — the branch keeps the tree NAME, so the keyed dir
    // travels verbatim and the clone resolves the same pairing.
    if (sfs.exists(p(s"$srcPath/centroids_$live")))
      TreeClone.linkOrCopy(p(s"$srcPath/centroids_$live"),
        p(s"$dstPath/centroids_$live"), conf)
    TreeClone.linkOrCopy(p(s"$srcPath/$live"), p(s"$dstPath/$live"),
      conf, skip = Set("_SUCCESS"))
    Seq(s"tombstones_$live", "tombstones").foreach { t =>
      if (sfs.exists(p(s"$srcPath/$t")))
        TreeClone.linkOrCopy(p(s"$srcPath/$t"), p(s"$dstPath/$t"), conf)
    }
    dfs.create(p(s"$dstPath/$live/_SUCCESS")).close()
  }

  /** Highest existing `lists_v{n}` suffix under `root`, committed OR
    * not — new writers must number past uncommitted leftovers from a
    * crashed rebuild/compaction so they never collide with or get
    * shadowed by garbage. 0 when none exist.
    */
  private def maxVersion(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Int =
    if (!fs.exists(root)) 0
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.matches("lists_v\\d+"))
      .map(_.stripPrefix("lists_v").toInt)
      .foldLeft(0)(math.max)

  /** Append a delta of NEW corpus vectors into the persisted lists
    * without rewriting untouched lists: each delta vector is assigned to
    * its Voronoi cell with the STORED codebook (stored cnorm, same
    * argmax + tie-break as [[write]] — so an appended vector lands in
    * exactly the cell a from-scratch rebuild would put it in), and the
    * append-mode partitioned write adds files ONLY under the `list=`
    * directories the delta actually touches. Probe parity with a
    * from-scratch build over old∪delta holds by construction; the spec
    * and `q_ann_ivf_upsert` gate it.
    *
    * Contract: delta ids must be NEW — never currently stored (this is
    * append, not upsert: re-appending duplicates the id in its list)
    * and never tombstoned-but-uncompacted (tombstones carry no sequence
    * numbers, so a re-appended deleted id stays masked at probe time
    * and the next [[compact]] drops it; to resurrect an id, [[compact]]
    * first, then append). Dedup upstream, e.g. [[Dedup.keepFirst]] on
    * id. Growing corpora
    * accumulate small files per touched list — run [[compact]] on the
    * usual compactor cadence to restore one-file-per-list.
    *
    * Crash caveat (append only): unlike [[write]]/[[compact]], an append
    * lands files directly in the LIVE tree with no version swap, so a
    * crash mid-append leaves a torn delta (some lists updated, some not)
    * visible to readers — and re-running the append would duplicate the
    * rows that did land. Recovery for a torn append is delete-the-delta-
    * ids (tombstones mask the partial rows) then re-append after a
    * [[compact]]; a deployment needing atomic deltas should batch them
    * through [[compact]]'s versioned path instead.
    */
  def append(
      spark: SparkSession,
      path: String,
      delta: DataFrame,
      idCol: String,
      vecCol: String,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val cent = storedCentFrame(spark, path)
    Similarity.invertedLists(delta, idCol, vecCol, cent)
      .select(col("__list").as("list"), col("neighbor_id"),
        col("__nv").as("vec"), col("__nn").as("vnorm"))
      .repartition(col("list"))
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("list")
      .parquet(s"$path/${liveLists(spark, path)}")
  }

  /** One micro-batch of streaming index maintenance — the foreachBatch
    * body behind [[graft.streaming.StreamingIvfMaintenance]]. The batch
    * carries an `opCol` of 'add' / 'delete' rows; adds are assigned with
    * the stored codebook and appended, deletes tombstone.
    *
    * IDEMPOTENT under at-least-once replay, which is what [[append]]
    * alone is not: before appending, the batch's adds are anti-joined
    * against the ids ALREADY STORED in the lists this batch touches —
    * the check reads only those `list=` partitions (static partition
    * pruning on the collected list ids, a codebook-bounded driver
    * value), and only the neighbor_id column, so its cost tracks the
    * batch's own fan-out, not the corpus. A replayed batch (crash before
    * the checkpoint advanced) or a torn append's re-run therefore
    * appends exactly the rows that are missing; tombstone deletes are
    * anti-join semantics and already replay-clean.
    *
    * COROLLARY, stated because it is invisible from the types: the
    * touched-list check is EXACTLY a replay guard, no more. A replayed
    * add re-derives the same assignment (deterministic codebook argmin),
    * so it always lands in a list the check reads — replays are complete
    * no-ops. An add of a live id carrying a CHANGED vector is caught
    * (and dropped, with a count in the maintenance log) only when the
    * new vector still assigns to a list holding the stored copy; if it
    * assigns ELSEWHERE, the default check cannot see the stored copy and
    * the id lands live in two lists — probes then return it twice, with
    * both vectors. Adds are inserts, not upserts; an update is
    * delete → [[compact]] → add (the tombstone masks until the fold).
    * Callers whose feed may carry re-embedded vectors for live ids
    * should set `strictLiveCheck = true`: the surviving adds are then
    * also checked against the FULL live tree's neighbor_id column (the
    * batch side broadcasts, so the scan is one column wide and never
    * shuffles the index) — making add-of-a-live-id an unconditional,
    * logged no-op at the cost of one id-column scan per batch.
    *
    * Same single-writer assumption as every maintenance op here, and the
    * [[append]] contract still applies across batches: a delete is
    * terminal until the next [[compact]] folds its tombstone — an add of
    * a tombstoned-but-uncompacted id lands masked (spec-gated:
    * delete → compact → re-add resurrects).
    *
    * SAME-ID delete + add in ONE batch is an UPDATE, and it is
    * supported by sequencing the documented recipe inside the batch
    * boundary: all deletes apply first, the index COMPACTS (folding the
    * masks — the terminal-until-compact rule honored, not bypassed),
    * then the adds append fresh. The compact is a full survivor rewrite,
    * so an update-carrying batch costs a compaction — the price of an
    * upsert on a pure-mask index, paid only when one is present (and
    * logged). Replay-safe: a redelivered update batch re-deletes the
    * re-added row, re-compacts, and re-appends the identical vector —
    * converging to the same index, one wasted rewrite. `retain` passes
    * through to that compact so a retention discipline on the tree is
    * not clobbered by maintenance.
    */
  def applyMaintenanceBatch(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      opCol: String,
      maxRecordsPerFile: Long = 5000000L,
      strictLiveCheck: Boolean = false,
      retain: Int = 1): Unit = {
    val adds = batch.filter(col(opCol) === "add")
      .select(col(idCol), col(vecCol))
      // An id twice in one batch (transport retry inside the batch) must
      // not land twice; vector choice is deterministic (max) not arrival
      // order.
      .groupBy(col(idCol)).agg(max(col(vecCol)).as(vecCol))
    val dels = batch.filter(col(opCol) === "delete").select(col(idCol))
    // Update detection (batch-sized semi-join): ids carrying BOTH a
    // delete and an add this batch.
    val upsert = !adds.join(dels, Seq(idCol), "left_semi").isEmpty
    if (upsert) {
      System.err.println("[graft] IvfIndex.applyMaintenanceBatch: batch " +
        "carries same-id delete+add (update) — applying deletes, " +
        "compacting, then appending (a compaction per update batch is " +
        "the pure-mask price)")
      if (!dels.isEmpty) delete(spark, path, dels, idCol)
      compact(spark, path, maxRecordsPerFile, retain)
      // Compact keeps the mask (early return) exactly when the batch
      // tombstoned EVERY stored row — fold-to-empty would commit an
      // unreadable tree. Without special handling the update's re-adds
      // would then be dropped by the already-stored anti-join (or land
      // permanently masked): silent data loss. The honest form of a
      // whole-index update IS a rebuild — write the adds as a fresh
      // generation under the STORED coarse codebook (assignments
      // identical to an append's), which also clears the consumed mask.
      if (tombstones(spark, path).isDefined) {
        System.err.println("[graft] IvfIndex.applyMaintenanceBatch: the " +
          "update batch masked every stored row — rebuilding from the " +
          "batch's adds under the stored codebook (fold-to-empty is " +
          "unreadable)")
        // Eager: write() OVERWRITES $path/centroids as its first step —
        // a lazy read from the same location would race its own
        // overwrite (FILE_NOT_EXIST mid-scan). Read via centDir so a
        // post-refit rebuild carries the refit codebook forward (the
        // rebuild re-lands it as the legacy dir, correctly paired).
        val cb = spark.read.parquet(centDir(spark, path))
          .select(col("centroid_id"), col("centroid"))
          .localCheckpoint(eager = true)
        write(path, adds, idCol, vecCol, cb,
          maxRecordsPerFile = maxRecordsPerFile, retain = retain)
        Checkpoints.release(cb)
        return
      }
    }
    val cent = storedCentFrame(spark, path)
    // Assign once; the boundary probe (distinct touched lists) and the
    // anti-join both reread this frame.
    val assigned = Similarity.invertedLists(adds, idCol, vecCol, cent)
      .localCheckpoint(eager = false)
    val touched = assigned.select(col("__list")).distinct()
      .collect().map(_.get(0)).toSeq
    if (touched.nonEmpty) {
      val live = liveLists(spark, path)
      val existing = spark.read.parquet(s"$path/$live")
        .filter(col("list").isin(touched: _*))
        .select(col("neighbor_id"))
      // Surface the adds the idempotency anti-join is about to drop (see
      // the Scaladoc corollary): a batch-sized semi-join over the already
      // list-pruned existing frame, so the count tracks the batch.
      // Strict mode: surviving adds are also checked against the FULL
      // tree's id column. The batch-id side broadcasts into a semi-join
      // over the one-column scan, so the hits frame is batch-bounded and
      // the index is never shuffled; checkpointed because it feeds both
      // the drop count and the anti-join.
      val liveElsewhere =
        if (!strictLiveCheck) None
        else Some(spark.read.parquet(s"$path/$live")
          .select(col("neighbor_id"))
          .join(broadcast(assigned.select(col("neighbor_id"))),
            Seq("neighbor_id"), "left_semi")
          .distinct()
          .localCheckpoint(eager = true))
      val dropped = assigned
        .join(existing, Seq("neighbor_id"), "left_semi").count() +
        liveElsewhere.map(h => assigned
          .join(existing, Seq("neighbor_id"), "left_anti")
          .join(broadcast(h), Seq("neighbor_id"), "left_semi")
          .count()).getOrElse(0L)
      if (dropped > 0) System.err.println(
        s"[graft] IvfIndex.applyMaintenanceBatch: $dropped add(s) for " +
          "already-live ids ignored (adds are not upserts; update = " +
          "delete -> compact -> add)")
      val fresh = assigned.join(existing, Seq("neighbor_id"), "left_anti")
      liveElsewhere.map(h => fresh.join(broadcast(h),
          Seq("neighbor_id"), "left_anti")).getOrElse(fresh)
        .select(col("__list").as("list"), col("neighbor_id"),
          col("__nv").as("vec"), col("__nn").as("vnorm"))
        .repartition(col("list"))
        .write.mode("append")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy("list")
        .parquet(s"$path/$live")
      liveElsewhere.foreach(Checkpoints.release)
    }
    // Non-update deletes apply after the adds (order irrelevant for
    // disjoint id sets — kept for minimal-diff history); update batches
    // already applied and folded them above.
    if (!upsert && !dels.isEmpty) delete(spark, path, dels, idCol)
    // A long-running maintenance job otherwise accumulates one batch-sized
    // persisted frame per micro-batch until a JVM GC lets ContextCleaner
    // notice the dead RDDs ([[graft.ops.Checkpoints]] discipline).
    Checkpoints.release(assigned)
  }

  /** Mark stored vectors DELETED without touching the list trees: ids
    * land in `tombstones_{live tree}/` (plain parquet, append per
    * delete batch, keyed to the tree they mask — see below) and
    * every probe anti-joins them out before scoring — the standard
    * vector-store delete (FAISS `remove_ids` rewrites in place; a
    * parquet-backed index can't, so it tombstones like every LSM).
    * [[compact]] folds tombstones into the rewritten tree and clears
    * them, restoring probe cost. Deleting an id that was never stored —
    * or twice — is a harmless no-op (anti-join semantics), which is
    * what makes the tombstone fold idempotent under crash-replay: if
    * compaction commits the filtered tree but dies before clearing
    * `tombstones/`, the leftover tombstones re-filter rows that no
    * longer exist.
    *
    * Tombstones are assumed COMPACTION-BOUNDED (a maintenance cadence
    * clears them); the probe-side anti-join is keyed on neighbor_id and
    * AQE broadcasts the tombstone side while it is small. An unbounded
    * delete backlog should compact, not accumulate.
    */
  def delete(
      spark: SparkSession,
      path: String,
      ids: DataFrame,
      idCol: String): Unit =
    // Keyed to the tree the ids were deleted FROM: a later rebuild's
    // readers resolve a different tree name and therefore never see
    // this generation's masks, closing the stale-tombstone window a
    // flat `tombstones/` dir left open between a rebuild's tree commit
    // and its cleanup (an id shared across generations would have
    // stayed masked in the NEW index until the cleanup landed).
    ids.select(col(idCol).as("neighbor_id")).distinct()
      .coalesce(1)
      .write.mode("append")
      .parquet(s"$path/tombstones_${liveLists(spark, path)}")

  /** The live tombstone set — the dirs keyed to the LIVE list tree plus
    * the legacy unversioned `tombstones/` (pre-migration indexes);
    * empty when none have been written.
    */
  /** REFIT the coarse codebook from the index's OWN live rows and
    * rebuild — the routing layer's drift ACTION ([[routingDrift]] /
    * StreamingIvfDrift alarm; [[graft.ops.PqIndex.refit]]'s sibling,
    * but for the layer where a refit means NEW Voronoi cells, so it is
    * a full [[write]] — no frozen-codebook shortcut exists up here).
    * The new codebook re-applies the deterministic value-keyed
    * sampling rule (`id % centroidMod == 0 && id < centroidCap`, the
    * family the inline [[Similarity.ivfTopK]] samples) over the
    * SURVIVORS — a drifted cohort that appended under stale cells now
    * contributes centroids, and the rebuilt partition covers its
    * region (`q_ann_ivf_refit` gates stale-codebook build + append +
    * refit ≡ a from-scratch build whose codebook sampled the full
    * corpus). A LEARNED-codebook upgrade stays the caller's:
    * [[graft.ml.KMeans]] fit + centroidFrame + [[write]]. Pending
    * tombstones fold (the refit corpus is the survivors); cost is a
    * rebuild, which is what an IVF refit IS — run on the drift
    * cadence.
    */
  def refit(spark: SparkSession, path: String, centroidMod: Long,
      centroidCap: Long = Long.MaxValue,
      maxRecordsPerFile: Long = 5000000L, retain: Int = 1): Unit = {
    val cur = liveLists(spark, path)
    val listsStored = spark.read.parquet(s"$path/$cur")
    val liveRows = tombstones(spark, path) match {
      case Some(t) => listsStored.join(t, Seq("neighbor_id"), "left_anti")
      case None => listsStored
    }
    // The corpus frame stays LAZY (it is consumed fully by the list
    // write below, before the old tree retires; a data-sized
    // checkpoint would double-materialize the index) — but the
    // codebook-sized centroid frame is EAGER: it feeds the codebook
    // write, the require, and the broadcast assignment, and re-deriving
    // it lazily would re-scan the full index once per consumer.
    val corpus = liveRows.select(col("neighbor_id"), col("vec"))
    val centRows = corpus
      .filter(pmod(col("neighbor_id"), lit(centroidMod)) === 0 &&
        col("neighbor_id") < centroidCap)
      .select(col("neighbor_id").as("centroid_id"),
        col("vec").as("centroid"))
      .localCheckpoint(eager = true)
    if (centRows.isEmpty) {
      Checkpoints.release(centRows)
      throw new IllegalArgumentException(
        s"refit of $path: the rule (id % $centroidMod == 0, id < " +
          s"$centroidCap) sampled no centroids from the live rows — a " +
          "codebook-less index would serve nothing; pick a rule the " +
          "corpus satisfies or supply a learned codebook via write()")
    }
    // A refit CHANGES the codebook, so — unlike [[write]]'s legacy
    // overwrite-centroids-first order — codebook and lists must swap
    // ATOMICALLY: the new codebook lands VERSION-KEYED to the new tree
    // (`centroids_lists_v{n+1}`, invisible to [[centDir]] until that
    // tree's `_SUCCESS` commits), the lists are built under it, and
    // the marker commits BOTH. A crash anywhere leaves the old
    // codebook+tree pairing serving; a `retain` > 1 refit is fully
    // [[rollback]]-able (the retired tree's keyed codebook goes with
    // it, and the previous tree re-pairs with ITS codebook — keyed if
    // it has one, legacy otherwise). The legacy `centroids` dir is
    // never touched here.
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val next = s"lists_v${maxVersion(fs, root) + 1}"
    val cent = Similarity.centFrame(centRows, "centroid_id", "centroid")
    cent.select(col("__cid").as("centroid_id"),
        col("__cv").as("centroid"), col("__cn").as("cnorm"))
      .write.mode("overwrite").parquet(s"$path/centroids_$next")
    Similarity.invertedLists(corpus, "neighbor_id", "vec", cent)
      .select(col("__list").as("list"), col("neighbor_id"),
        col("__nv").as("vec"), col("__nn").as("vnorm"))
      .repartition(col("list"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("list")
      .parquet(s"$path/$next")
    Checkpoints.release(centRows)
    retireSuperseded(fs, root, path, retain, consumed = Set.empty)
  }

  /** [[Similarity.routingDrift]] with the INDEX ITSELF as the build
    * cohort: the stored lists already materialize the assignment (the
    * `list` partition key IS each row's argmax centroid), so the
    * reference side needs no argmax scan — one equi-join of the live
    * unmasked rows against the broadcast stored codebook scores each
    * row against exactly its OWN centroid, while the delta side pays
    * the usual assignment scan. Same output row and the same
    * 1e-4-quantized integer error sums as the inline form; alarm →
    * re-cluster + [[write]] (the IVF refit is a rebuild with a NEW
    * codebook — there is no frozen-codebook shortcut for the routing
    * layer, and re-encoding is the PQ side's problem, not this one's).
    */
  def routingDrift(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val centStored = storedCentFrame(spark, path)
    val buildErr = liveRoutingErr(spark, path, centStored)
      .toDF("build_n", "build_err")
    val deltaErr = Similarity.routingErrAgg(delta, idCol, vecCol,
      centStored).toDF("delta_n", "delta_err")
    buildErr.crossJoin(deltaErr)
      .select(col("build_n"), col("build_err"), col("delta_n"),
        col("delta_err"),
        round((col("delta_err") / col("delta_n")) /
          (col("build_err") / col("build_n")), 4).as("drift_ratio"))
  }

  /** Resolve the codebook dir PAIRED with the live list tree: the
    * version-keyed `centroids_lists_v{n}` when the live tree carries
    * one (written by [[refit]], whose codebook+lists swap commits
    * atomically under the tree's `_SUCCESS`), else the legacy
    * unversioned `centroids`. Every reader of the stored codebook MUST
    * come through here — a raw `$path/centroids` read after a refit
    * pairs the wrong codebook with the live tree.
    */
  private[graft] def centDir(spark: SparkSession, path: String): String = {
    val keyed = s"$path/centroids_${liveLists(spark, path)}"
    val p = new org.apache.hadoop.fs.Path(keyed)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      keyed
    else s"$path/centroids"
  }

  /** The stored codebook paired with the live tree, in the normalized
    * broadcast-small (__cid long, __cv, __cn) frame shape every reader
    * shares ([[Similarity.centFrame]]'s contract).
    */
  private[graft] def storedCentFrame(spark: SparkSession,
      path: String): DataFrame =
    spark.read.parquet(centDir(spark, path))
      .select(col("centroid_id").cast("long").as("__cid"),
        col("centroid").as("__cv"), col("cnorm").as("__cn"))

  /** Mean 1e-4-quantized angular slack of the live unmasked rows to
    * their OWN stored centroid — [[routingDrift]]'s build-side mean
    * alone, the pre-aggregated reference denominator a drift monitor
    * caches ([[graft.ops.PqIndex.meanQuantizationError]]'s sibling).
    * One equi-join scan of the live lists against the broadcast stored
    * codebook.
    */
  def meanRoutingError(spark: SparkSession, path: String): Double = {
    val r = liveRoutingErr(spark, path,
      storedCentFrame(spark, path)).collect()(0)
    require(r.getLong(0) > 0, s"meanRoutingError of $path: no live rows")
    r.getLong(1).toDouble / r.getLong(0)
  }

  /** (n, Σ quantized slack) of the live unmasked rows against their
    * OWN stored centroid — the no-argmax scan [[routingDrift]] and
    * [[meanRoutingError]] share (the stored `list` key IS the argmax).
    */
  private def liveRoutingErr(spark: SparkSession, path: String,
      centStored: DataFrame): DataFrame = {
    val listsStored = spark.read
      .parquet(s"$path/${liveLists(spark, path)}")
    val live = tombstones(spark, path) match {
      case Some(t) => listsStored.join(t, Seq("neighbor_id"), "left_anti")
      case None => listsStored
    }
    live
      .select(col("list").cast("long").as("__cid"), col("vec"),
        col("vnorm"))
      .join(broadcast(centStored), Seq("__cid"))
      .select((Similarity.dot(col("vec"), col("__cv")) /
        (col("vnorm") * col("__cn"))).as("__best"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(round((lit(1.0) - col("__best")) * 10000).cast("long"))
          .cast("long").as("err"))
  }

  private[ops] def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = liveLists(spark, path)
    val existing = Seq(s"$path/tombstones_$live", s"$path/tombstones")
      .filter { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).exists(p)
      }
    if (existing.isEmpty) None
    else Some(existing.map(spark.read.parquet(_)).reduce(_ unionByName _))
  }

  /** Resolve the LIVE inverted-list directory name: the highest
    * `lists_v{n}` whose `_SUCCESS` marker exists (a compacted copy
    * becomes visible exactly when Spark's committer drops the marker —
    * its last step), falling back to the initial `lists` tree. This is
    * how readers stay crash-safe without any rename: an interrupted
    * compaction leaves an uncommitted (marker-less) directory that every
    * reader ignores.
    */
  private[graft] def liveLists(spark: SparkSession, path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val versions =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.matches("lists_v\\d+"))
        .filter(n => fs.exists(
          new org.apache.hadoop.fs.Path(s"$path/$n/_SUCCESS")))
        .sortBy(_.stripPrefix("lists_v").toInt)
    versions.lastOption.getOrElse("lists")
  }

  /** Rewrite the inverted lists back to one writer per list, merging the
    * small files [[append]] accumulates. Crash-safe via VERSIONED
    * directories, not renames: the merged copy is written as
    * `lists_v{n+1}` (invisible until the committer's `_SUCCESS` lands —
    * its final step), readers resolve [[liveLists]] to the highest
    * committed version, and only then is the previous tree deleted. A
    * crash at any point leaves either the old committed tree live or
    * both (next compaction cleans up) — never a half-deleted index.
    * A reader that resolved the OLD version name just before its
    * deletion can still fail mid-scan; production deployments should
    * defer the delete by a scan-length grace period (the same retention
    * discipline as the gold compactor).
    */
  def compact(
      spark: SparkSession,
      path: String,
      maxRecordsPerFile: Long = 5000000L,
      retain: Int = 1): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val cur = liveLists(spark, path)
    val conf0 = spark.sparkContext.hadoopConfiguration
    val root0 = new org.apache.hadoop.fs.Path(path)
    val fs0 = root0.getFileSystem(conf0)
    // Number past EVERY existing version dir, committed or not — a stale
    // uncommitted leftover (crashed compaction) must never collide with
    // or outrank the copy about to be written.
    val next = s"lists_v${maxVersion(fs0, root0) + 1}"
    val live = spark.read.parquet(s"$path/$cur")
    // Fold tombstones into the rewrite: the compacted tree is born
    // clean, and the tombstone files are cleared only AFTER the tree
    // commits — a crash in between leaves tombstones re-filtering rows
    // that no longer exist, which is a no-op (see [[delete]]).
    val folded = tombstones(spark, path) match {
      case Some(t) => live.join(t, Seq("neighbor_id"), "left_anti")
      case None => live
    }
    // An ALL-TOMBSTONED index must keep its mask instead of committing
    // an empty tree: a partitioned overwrite of zero rows lands a
    // `_SUCCESS` with no parquet files, and every later read of the
    // resolved live tree dies on schema inference. The mask already
    // hides everything, so skipping the rewrite is behavior-identical
    // for probes (the PqIndex/MaxSimIndex all-deleted stance).
    if (folded.isEmpty) {
      System.err.println(s"[graft] IvfIndex.compact: every stored row " +
        s"under $path is tombstoned — keeping the mask instead of " +
        "committing an empty tree. This mask can never be folded (every " +
        "compact re-hits this case): NEW ids still append and serve " +
        "(the mask only hides the tombstoned ids), but repopulating the " +
        "masked ids needs a rebuild (write), which clears it")
      return
    }
    // A post-[[refit]] tree carries a version-keyed codebook; the
    // compacted copy keeps the SAME cells, so the pairing must travel
    // to the new tree name — cloned BEFORE the tree commits (an
    // uncommitted tree is invisible, so a crash in between changes
    // nothing; committing first would open a window where the new tree
    // resolves against the legacy pre-refit codebook).
    val keyedCur = new org.apache.hadoop.fs.Path(s"$path/centroids_$cur")
    if (fs0.exists(keyedCur))
      TreeClone.linkOrCopy(keyedCur,
        new org.apache.hadoop.fs.Path(s"$path/centroids_$next"), conf0)
    folded
      .repartition(col("list"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("list")
      .parquet(s"$path/$next")
    // Retention as in [[write]] (`retain` newest committed trees kept,
    // for [[rollback]]), plus the folded generation's masks
    // (version-keyed + legacy) as `consumed`: the committed new tree
    // never consults them, and clearing them means a rollback restores
    // `cur` to its PRE-delete state — rollback undoes the compact AND
    // the deletes it folded, which is the bad-delete-shipped undo.
    retireSuperseded(fs0, root0, path, retain,
      consumed = Set(s"tombstones_$cur"))
  }

  /** Retire the LIVE list tree so the previous committed one serves
    * again — possible only when the superseding [[write]]/[[compact]]
    * ran with `retain` > 1. The restored tree serves with whatever
    * keyed tombstones it still has: a rebuild keeps the old tree's
    * masks (its deletes were serving state independent of the rebuild),
    * while a completed compact cleared the masks it folded — so
    * delete → compact(retain=2) → rollback RESURRECTS the deleted ids
    * (the rollback undoes the delete+compact pair as one commit).
    *
    * Same number-reuse caveat as [[graft.ops.VersionedTree.rollback]]:
    * the next commit re-numbers into the retired slot, so a reader that
    * resolved the retired name pre-rollback could pair it with the
    * recommitted tree — the single writer owns sequencing rollbacks
    * against in-flight probes. A crash-interrupted compact (committed
    * tree, uncleared masks) leaves the retained tree's consumed masks
    * in place; a rollback then restores the post-delete state instead —
    * conservative, and the stale dir is plain to delete by hand.
    */
  def rollback(spark: SparkSession, path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val committed = committedTrees(fs, path)
    require(committed.size >= 2, "rollback needs a retained previous " +
      s"list tree under $path (found ${committed.size} committed; " +
      "write/compact with retain > 1)")
    val retired = committed.last
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/$retired"), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/tombstones_$retired"), true)
    // The retired tree's version-keyed codebook (a rolled-back
    // [[refit]]) goes with it — the previous tree re-pairs with ITS
    // codebook (keyed if it has one, legacy otherwise) via [[centDir]].
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/centroids_$retired"), true)
    committed(committed.size - 2)
  }

  /** Serve one probe batch from the stored artifact. Same output contract
    * as [[Similarity.ivfTopKWith]]: (query_id, neighbor_id, rank, cos).
    */
  def topK(
      spark: SparkSession,
      path: String,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 3): DataFrame = {
    val centStored = spark.read.parquet(centDir(spark, path))
    val listsStored = spark.read.parquet(s"$path/${liveLists(spark, path)}")
    // The partition column comes back through directory-name inference,
    // which narrows numeric types (long → int). Align the CODEBOOK side
    // to the inferred type — casting the broadcast-small side keeps the
    // partitioned scan's join key a bare partition attribute, which is
    // what keeps dynamic partition pruning eligible. Ids that actually
    // wrote a lists/ directory fit the inferred type by construction;
    // an EMPTY centroid (no assigned vectors) can carry an id beyond
    // that range, and a bare non-ANSI cast would wrap it onto a real
    // list id, mis-routing its probes — so out-of-range ids map to a
    // NULL join key instead. NULL never equi-joins, which is exactly
    // the empty centroid's semantics: probing it contributes no rows.
    val listType = listsStored.schema("list").dataType
    val idRange: Option[(Long, Long)] = listType match {
      case org.apache.spark.sql.types.ByteType =>
        Some((Byte.MinValue.toLong, Byte.MaxValue.toLong))
      case org.apache.spark.sql.types.ShortType =>
        Some((Short.MinValue.toLong, Short.MaxValue.toLong))
      case org.apache.spark.sql.types.IntegerType =>
        Some((Int.MinValue.toLong, Int.MaxValue.toLong))
      case _ => None // long/string/decimal inference: cast is total
    }
    val safeId = idRange match {
      case Some((lo, hi)) =>
        when(col("centroid_id").between(lo, hi), col("centroid_id"))
      case None => col("centroid_id")
    }
    val cent = centStored.select(
      safeId.cast(listType).as("__cid"),
      col("centroid").as("__cv"), col("cnorm").as("__cn"))
    // Tombstoned rows leave the candidate stream BEFORE scoring — keyed
    // anti-join on neighbor_id, broadcast by AQE while the tombstone set
    // is compaction-bounded. Placed after the list scan so dynamic
    // partition pruning on `list` is undisturbed.
    val listsLive = tombstones(spark, path) match {
      case Some(t) => listsStored.join(t, Seq("neighbor_id"), "left_anti")
      case None => listsStored
    }
    val lists = listsLive.select(col("list").as("__list"),
      col("neighbor_id"), col("vec").as("__nv"), col("vnorm").as("__nn"))
    Similarity.probeInvertedLists(probes, idCol, vecCol, k, cent, lists, nprobe)
  }
}
