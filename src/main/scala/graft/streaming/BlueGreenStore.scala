package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The transactional substrate [[StreamingGold]] and
  * [[StreamingCountMin]] share: a blue/green parquet snapshot with the
  * committed batch id recorded INSIDE the snapshot.
  *
  *   - Readers always see a complete snapshot; the pointer move is the
  *     atomic commit point.
  *   - The `_committed_batch` marker travels with the data in the same
  *     swap, so a crash between "wrote data" and "wrote marker" cannot
  *     happen — state and batch id are one artifact.
  *   - `commit(df, id)` writes the STANDBY slot and swaps; callers
  *     check [[committedBatchId]] first to make micro-batch replays
  *     no-ops.
  *   - The check→merge→swap sequence is NOT atomic on its own: two
  *     writers on one rootDir (a manual backfill beside a live query)
  *     could interleave and silently drop one merge — for
  *     [[StreamingCountMin]]'s non-idempotent sum state that is silent
  *     undercounting. Writers therefore run the whole sequence inside
  *     [[withWriteLock]]: a JVM-wide monitor per canonical root (two
  *     threads of one process) plus an OS file lock on `_writer.lock`
  *     (two processes). The store is java.nio-local-FS by construction,
  *     which is exactly where `FileChannel.lock` is reliable.
  */
private[streaming] final class BlueGreenStore(rootDir: String) {

  private val pointer = Paths.get(rootDir, "current")
  private val slots = Seq("gold_a", "gold_b")

  /** Serialize a whole read-merge-swap against every other writer of
    * this rootDir — same-process writers via the shared monitor,
    * cross-process writers via an exclusive `_writer.lock` file lock
    * (blocking; released even when `f` throws).
    */
  def withWriteLock[T](f: => T): T = {
    // Monitor key must resolve SYMLINKS, not just ".."/"." — two
    // same-process writers addressing one store via different spellings
    // (classically /var vs /private/var tmpdirs) would otherwise get
    // distinct monitors, both enter, and the second same-JVM
    // FileChannel.lock on _writer.lock THROWS OverlappingFileLockException
    // instead of blocking. toRealPath needs the path to exist, hence the
    // createDirectories-first and the normalize fallback.
    val monitorKey =
      try {
        Files.createDirectories(Paths.get(rootDir))
        Paths.get(rootDir).toRealPath().toString
      } catch { case _: java.io.IOException =>
        Paths.get(rootDir).toAbsolutePath.normalize.toString
      }
    val monitor = BlueGreenStore.monitors.computeIfAbsent(
      monitorKey, _ => new Object)
    monitor.synchronized {
      // Reentrant: the monitor already is (synchronized), but a nested
      // withWriteLock on the same store from the HOLDING thread (a
      // backfill loop wrapping mergeBatch calls, each of which takes the
      // lock itself) would hit a second same-JVM FileChannel.lock, which
      // THROWS OverlappingFileLockException rather than blocking. A
      // thread that already holds this key's lock just runs `f`.
      if (BlueGreenStore.heldKeys.get.contains(monitorKey)) f
      else {
        Files.createDirectories(Paths.get(rootDir))
        val ch = java.nio.channels.FileChannel.open(
          Paths.get(rootDir, "_writer.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock()
          BlueGreenStore.heldKeys.get.add(monitorKey)
          try f finally {
            BlueGreenStore.heldKeys.get.remove(monitorKey)
            lock.release()
          }
        } finally ch.close()
      }
    }
  }

  private def currentSlot: Option[String] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim) else None

  private def slotDir(slot: String) = Paths.get(rootDir, slot)

  /** Batch id recorded in the LIVE snapshot; -1 before the first commit. */
  def committedBatchId: Long =
    currentSlot.map { s =>
      val marker = slotDir(s).resolve("_committed_batch")
      if (Files.exists(marker)) Files.readString(marker).trim.toLong else -1L
    }.getOrElse(-1L)

  /** The live snapshot, if any batch has committed.
    *
    * Freshness window: the returned frame is LAZY and anchored to the
    * slot directory that was live at call time. Commits alternate two
    * slots, so a frame evaluated two or more commits later reads a slot
    * that has been overwritten in place — FileNotFoundException or torn
    * metadata. Consume (or `.localCheckpoint()`) within one commit
    * generation; dashboards holding frames across triggers must re-call
    * read() per render.
    */
  def read(spark: SparkSession): Option[DataFrame] =
    currentSlot.map(s => spark.read.parquet(slotDir(s).resolve("data").toString))

  /** Write `merged` as the new snapshot under `batchId` and swap. */
  def commit(merged: DataFrame, batchId: Long): Unit = {
    val target = currentSlot match {
      case Some(s) if slots.contains(s) => slots.find(_ != s).get
      case _ => slots.head
    }
    val dir = slotDir(target)
    Files.createDirectories(dir)
    merged.write.mode("overwrite").parquet(dir.resolve("data").toString)
    Files.writeString(dir.resolve("_committed_batch"), batchId.toString)
    val tmp = Paths.get(rootDir, "current.tmp")
    Files.writeString(tmp, target)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Remove stale slot directories no pointer references. Never touches
    * the live slot — which requires the WRITE LOCK: an unserialized
    * vacuum could read the pointer just before a concurrent commit's
    * swap and delete the slot that is being written or has just gone
    * live, permanently losing the merged state.
    */
  def vacuum(): Unit = withWriteLock {
    val live = currentSlot
    slots.filterNot(live.contains).map(slotDir).filter(Files.exists(_))
      .foreach { d =>
        Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
  }
}

private[streaming] object BlueGreenStore {
  // One monitor per canonical root: FileChannel locks are per-JVM (a
  // second lock attempt from another THREAD throws rather than blocks),
  // so in-process mutual exclusion needs this layer in front.
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // Canonical roots whose write lock the CURRENT THREAD already holds —
  // the reentrancy ledger for nested withWriteLock calls (see there).
  private val heldKeys: ThreadLocal[scala.collection.mutable.Set[String]] =
    ThreadLocal.withInitial(() => scala.collection.mutable.Set.empty[String])
}
