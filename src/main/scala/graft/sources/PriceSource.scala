package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source for the item-price time-series (SURVEY.md
  * §2.1 S8): one InputPartition PER ITEM, so a 1000-executor cluster fans
  * the per-item fetches out instead of the reference's serial driver loop
  * with a politeness sleep (`/root/reference/src/4_fetch_item_prices.py:
  * 54-82,203,222`).
  *
  * The transport is pluggable: `PriceFetcher.registry` maps a named fetcher
  * to a function `(itemId, timestepSeconds) => rows`. Tests (and this
  * zero-egress environment) register deterministic in-memory fetchers; a
  * production build registers the HTTP client. The partition carries only
  * (fetcherName, itemId) — executors resolve the fetcher from the registry,
  * so nothing non-serializable crosses the wire.
  *
  * Usage:
  *   spark.read.format("graft.sources.PriceSource")
  *     .option("items", "2,6,30")
  *     .option("fetcher", "test")
  *     .option("timestep", "86400")
  *     .load()
  */
class PriceSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PriceSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PriceTable(new CaseInsensitiveStringMap(properties))
}

object PriceSource {
  val schema: StructType = StructType(Seq(
    StructField("item_id", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("avg_high_price", LongType, nullable = true),
    StructField("avg_low_price", LongType, nullable = true)))
}

/** One fetched observation. */
case class PricePoint(epochSeconds: Long, avgHigh: Option[Long], avgLow: Option[Long])

/** Pluggable transport registry (driver + executors share it via the
  * object; fetchers must be registered before the job runs on the
  * executor's JVM — in local mode that is the same JVM, on a cluster the
  * fetcher registration belongs in executor startup, e.g. a plugin).
  */
object PriceFetcher {
  type Fetch = (String, Long) => Seq[PricePoint]
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Fetch]()
  def register(name: String, f: Fetch): Unit = registry.put(name, f)
  def apply(name: String): Fetch = {
    val f = registry.get(name)
    require(f != null, s"no PriceFetcher registered under '$name'")
    f
  }

  /** Permanent per-item failure (the API's 404): never retried; the item
    * lands empty and is recorded, exactly the reference's
    * `failed_items.append(...); continue` envelope
    * (`/root/reference/src/4_fetch_item_prices.py:72-75,201-203`).
    */
  final class ItemNotFound(itemId: String)
    extends RuntimeException(s"item $itemId not found")
}

/** JVM-wide politeness throttle: request START times are spaced at least
  * `delayMs` apart across every concurrently-reading partition on this
  * executor — the distributed analogue of the reference's serial
  * `time.sleep(request_delay)` between API calls
  * (`4_fetch_item_prices.py:203,222`). Per-executor (not per-cluster) by
  * design: a fleet's aggregate rate is bounded by executors × 1/delay,
  * which the caller sizes via the `request_delay_ms` option.
  */
object PriceThrottle {
  // Monotonic clock: interval spacing must not stall (backwards NTP step)
  // or collapse (forward step) with wall-clock adjustments.
  private var lastStartNanos = Long.MinValue
  def await(delayMs: Long): Unit = if (delayMs > 0) {
    val myStart = synchronized {
      val now = System.nanoTime()
      val t = math.max(now, lastStartNanos + delayMs * 1000000L)
      lastStartNanos = t
      t
    }
    val waitMs = (myStart - System.nanoTime()) / 1000000L
    if (waitMs > 0) Thread.sleep(waitMs)
  }
}

/** Record of tolerated per-item fetch failures — the distributed
  * `failed_items` summary.
  *
  * Two channels, because readers record on EXECUTORS while the summary
  * is read on the DRIVER:
  *
  *   - a Spark `CollectionAccumulator`, created at scan-planning time and
  *     shipped inside each [[PricePartition]] — task updates merge back
  *     to the driver, so `snapshot` is correct on a real cluster. (Like
  *     any accumulator it is at-least-once under task retries — an
  *     observability channel, not an exactness one.)
  *   - a JVM-local queue, kept as the fallback view for unit tests that
  *     drive a [[PriceReader]] without a job (and identical to the
  *     accumulator view in local mode, minus retry double-counts).
  */
object PriceFetchStats {
  @volatile private var acc:
    Option[org.apache.spark.util.CollectionAccumulator[(String, String)]] = None
  private val failures =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  /** Driver-side: ONE accumulator per SparkContext, shared by every scan
    * planned on it. A per-planning accumulator would break under AQE,
    * which may re-plan the scan AFTER the stage that recorded the
    * failures ran — the freshly-attached (empty) instance would shadow
    * the one the tasks actually updated.
    *
    * The element type is the (itemId, reason) tuple itself — tuples are
    * Java-serializable, and carrying them structured removes the string
    * round-trip that mis-parsed itemIds containing ": ".
    */
  private[sources] def accumulatorFor(sc: org.apache.spark.SparkContext)
      : org.apache.spark.util.CollectionAccumulator[(String, String)] =
    synchronized {
      acc match {
        case Some(a) if attachedTo.exists(_ eq sc) => a
        case _ =>
          val a = sc.collectionAccumulator[(String, String)](
            "graft.price_fetch_failures")
          acc = Some(a)
          attachedTo = Some(sc)
          a
      }
    }
  @volatile private var attachedTo: Option[org.apache.spark.SparkContext] = None

  def record(itemId: String, reason: String): Unit =
    failures.add(itemId -> reason)

  /** Driver-side view: the attached accumulator (cluster-correct) when a
    * scan has been planned, else the JVM-local queue.
    */
  def snapshot: Seq[(String, String)] = acc match {
    case Some(a) =>
      import scala.jdk.CollectionConverters._
      a.value.asScala.toSeq
    case None => localSnapshot
  }

  /** The JVM-local queue only (executor-side or no-job unit tests). */
  def localSnapshot: Seq[(String, String)] = {
    val it = failures.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def clear(): Unit = {
    failures.clear()
    acc.foreach(_.reset())
  }
}

class PriceTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_item_prices"
  override def schema(): StructType = PriceSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    // Pointed error at planning, not an NPE from a null .split deep in
    // scan construction.
    require(options.containsKey("items"),
      "price source needs .option(\"items\", \"id1,id2,...\")")
    () => new PriceScan(
      options.get("items").split(",").map(_.trim).filter(_.nonEmpty),
      options.getOrDefault("fetcher", "test"),
      options.getLong("timestep", 86400L),
      FetchPolicy(
        requestDelayMs = options.getLong("request_delay_ms", 0L),
        maxRetries = options.getInt("max_retries", 2),
        retryBackoffMs = options.getLong("retry_backoff_ms", 100L),
        tolerateFailures = options.getBoolean("tolerate_failures", true)))
  }
}

/** The reference's fetch envelope as source options: politeness delay
  * between request starts, bounded retry with linear backoff for
  * transient failures, and the tolerated-failure policy (a dead item
  * yields zero rows and a recorded reason instead of failing the job —
  * or fails the task when `tolerate_failures=false`).
  */
case class FetchPolicy(
    requestDelayMs: Long,
    maxRetries: Int,
    retryBackoffMs: Long,
    tolerateFailures: Boolean)

class PriceScan(items: Array[String], fetcher: String, timestep: Long,
    policy: FetchPolicy) extends Scan {
  override def readSchema(): StructType = PriceSource.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      items.map(id =>
        PricePartition(id, fetcher, timestep, policy): InputPartition)
    // The failure accumulator rides in the READER FACTORY, not the
    // partitions: factories are serialized inside the task binary and
    // deserialized under an active TaskContext, which is what registers
    // a deserialized AccumulatorV2 for end-of-task reporting. A
    // partition field deserializes with the Task object BEFORE the
    // context exists — its updates would be dropped silently.
    override def createReaderFactory(): PartitionReaderFactory = {
      val acc = PriceFetchStats.accumulatorFor(
        org.apache.spark.sql.SparkSession.active.sparkContext)
      new PriceReaderFactory(acc)
    }
  }
}

class PriceReaderFactory(
    failures: org.apache.spark.util.CollectionAccumulator[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PriceReader(p.asInstanceOf[PricePartition], failures)
}

case class PricePartition(itemId: String, fetcher: String, timestep: Long,
    policy: FetchPolicy) extends InputPartition

class PriceReader(part: PricePartition,
    failures: org.apache.spark.util.CollectionAccumulator[(String, String)])
  extends PartitionReader[InternalRow] {
  // Lazy: the fetch (and its politeness wait) happens on first next(),
  // not at reader construction.
  private lazy val rows: Iterator[PricePoint] = fetchWithPolicy().iterator
  private var current: PricePoint = _

  // Executor-side record: the accumulator merges back to the driver;
  // the JVM-local queue serves same-JVM (local-mode / unit-test) reads.
  private def record(reason: String): Unit = {
    failures.add(part.itemId -> reason)
    PriceFetchStats.record(part.itemId, reason)
  }

  private def fetchWithPolicy(): Seq[PricePoint] = {
    val fetch = PriceFetcher(part.fetcher)
    val p = part.policy
    var attempt = 0
    while (true) {
      PriceThrottle.await(p.requestDelayMs)
      try {
        return fetch(part.itemId, part.timestep)
      } catch {
        case e: PriceFetcher.ItemNotFound =>
          // Permanent: retrying a 404 only burns the rate budget. Strict
          // mode still fails the task — completeness was requested.
          if (!p.tolerateFailures) throw e
          record(e.getMessage)
          return Seq.empty
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt > p.maxRetries) {
            if (p.tolerateFailures) {
              record(s"failed after $attempt attempts: ${e.getMessage}")
              return Seq.empty
            } else throw e
          }
          // Linear backoff, reference-style simplicity; each retry also
          // re-enters the politeness gate above.
          Thread.sleep(p.retryBackoffMs * attempt)
      }
    }
    Seq.empty // unreachable
  }

  override def next(): Boolean = {
    if (!rows.hasNext) return false
    current = rows.next()
    true
  }

  override def get(): InternalRow =
    InternalRow(
      UTF8String.fromString(part.itemId),
      current.epochSeconds * 1000000L, // TimestampType = µs since epoch
      current.avgHigh.map(Long.box).orNull,
      current.avgLow.map(Long.box).orNull)

  override def close(): Unit = ()
}
