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

/** Per-JVM record of tolerated per-item fetch failures — the distributed
  * `failed_items` summary. Tests assert on it; production reads a
  * snapshot after the job for observability/alerting.
  */
object PriceFetchStats {
  private val failures =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  def record(itemId: String, reason: String): Unit =
    failures.add(itemId -> reason)
  def snapshot: Seq[(String, String)] = {
    val it = failures.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) b += it.next()
    b.result()
  }
  def clear(): Unit = failures.clear()
}

class PriceTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_item_prices"
  override def schema(): StructType = PriceSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
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
      items.map(id => PricePartition(id, fetcher, timestep, policy): InputPartition)
    override def createReaderFactory(): PartitionReaderFactory =
      (p: InputPartition) => {
        val part = p.asInstanceOf[PricePartition]
        new PriceReader(part)
      }
  }
}

case class PricePartition(itemId: String, fetcher: String, timestep: Long,
    policy: FetchPolicy) extends InputPartition

class PriceReader(part: PricePartition) extends PartitionReader[InternalRow] {
  // Lazy: the fetch (and its politeness wait) happens on first next(),
  // not at reader construction.
  private lazy val rows: Iterator[PricePoint] = fetchWithPolicy().iterator
  private var current: PricePoint = _

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
          PriceFetchStats.record(part.itemId, e.getMessage)
          return Seq.empty
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt > p.maxRetries) {
            if (p.tolerateFailures) {
              PriceFetchStats.record(part.itemId,
                s"failed after $attempt attempts: ${e.getMessage}")
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
