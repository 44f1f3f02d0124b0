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
  */
private[streaming] final class BlueGreenStore(rootDir: String) {

  private val pointer = Paths.get(rootDir, "current")
  private val slots = Seq("gold_a", "gold_b")

  private def currentSlot: Option[String] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim) else None

  private def slotDir(slot: String) = Paths.get(rootDir, slot)

  /** Batch id recorded in the LIVE snapshot; -1 before the first commit. */
  def committedBatchId: Long =
    currentSlot.map { s =>
      val marker = slotDir(s).resolve("_committed_batch")
      if (Files.exists(marker)) Files.readString(marker).trim.toLong else -1L
    }.getOrElse(-1L)

  /** The live snapshot, if any batch has committed. */
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
    * the live slot.
    */
  def vacuum(): Unit = {
    val live = currentSlot
    slots.filterNot(live.contains).map(slotDir).filter(Files.exists(_))
      .foreach { d =>
        Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
  }
}
