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
      options.getLong("timestep", 86400L))
}

class PriceScan(items: Array[String], fetcher: String, timestep: Long) extends Scan {
  override def readSchema(): StructType = PriceSource.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      items.map(id => PricePartition(id, fetcher, timestep): InputPartition)
    override def createReaderFactory(): PartitionReaderFactory =
      (p: InputPartition) => {
        val part = p.asInstanceOf[PricePartition]
        new PriceReader(part)
      }
  }
}

case class PricePartition(itemId: String, fetcher: String, timestep: Long)
    extends InputPartition

class PriceReader(part: PricePartition) extends PartitionReader[InternalRow] {
  private val rows: Iterator[PricePoint] =
    PriceFetcher(part.fetcher)(part.itemId, part.timestep).iterator
  private var current: PricePoint = _

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
