package graft.sources

import java.nio.file.Files
import java.time.{Duration, Instant}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import graft.parse.ValueOverride
import graft.sources.ItemMappingDim.ItemMeta
import org.scalatest.funsuite.AnyFunSuite

class ItemMappingDimSpec extends AnyFunSuite with SparkTestBase {

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private val ttl = Duration.ofHours(24)

  private def tempCache() =
    Files.createTempDirectory("item-mapping").resolve("item_mapping.tsv")

  test("cold fetch writes the cache; warm load within TTL never refetches") {
    val calls = new AtomicInteger(0)
    MappingFetcher.register("dim-a", () => {
      calls.incrementAndGet()
      Seq(ItemMeta("2", "Cannonball"), ItemMeta("6", "Cannon base"))
    })
    val cache = tempCache()

    val m1 = ItemMappingDim.load(cache, "dim-a", Seq("2"), ttl, t0)
    assert(m1("2").name == "Cannonball" && calls.get() == 1)
    assert(Files.exists(cache))

    val m2 = ItemMappingDim.load(cache, "dim-a", Seq("2", "6"), ttl, t0.plus(Duration.ofHours(23)))
    assert(m2 == m1 && calls.get() == 1) // cache hit, no fetch
  }

  test("TTL expiry refetches and rewrites the cache") {
    val calls = new AtomicInteger(0)
    MappingFetcher.register("dim-b", () => {
      calls.incrementAndGet()
      Seq(ItemMeta("2", s"Cannonball v${calls.get()}"))
    })
    val cache = tempCache()
    ItemMappingDim.load(cache, "dim-b", Seq("2"), ttl, t0)
    val stale = ItemMappingDim.load(cache, "dim-b", Seq("2"), ttl, t0.plus(Duration.ofHours(25)))
    assert(calls.get() == 2 && stale("2").name == "Cannonball v2")
    // ...and the rewritten cache serves the next load without a fetch.
    ItemMappingDim.load(cache, "dim-b", Seq("2"), ttl, t0.plus(Duration.ofHours(26)))
    assert(calls.get() == 2)
  }

  test("a configured id missing from a fresh cache forces a refresh") {
    val calls = new AtomicInteger(0)
    MappingFetcher.register("dim-c", () => {
      calls.incrementAndGet()
      if (calls.get() == 1) Seq(ItemMeta("2", "Cannonball"))
      else Seq(ItemMeta("2", "Cannonball"), ItemMeta("30", "New item"))
    })
    val cache = tempCache()
    ItemMappingDim.load(cache, "dim-c", Seq("2"), ttl, t0)
    // Required id 30 is not in the cached mapping → forced update (:158-170).
    val m = ItemMappingDim.load(cache, "dim-c", Seq("2", "30"), ttl, t0.plus(Duration.ofMinutes(5)))
    assert(calls.get() == 2 && m.contains("30"))
  }

  test("failed fetch with a readable cache falls back, flagged StalePartial") {
    MappingFetcher.register("dim-d-ok", () => Seq(ItemMeta("2", "Cannonball")))
    MappingFetcher.register("dim-d-boom", () => sys.error("HTTP 503"))
    val cache = tempCache()
    ItemMappingDim.load(cache, "dim-d-ok", Seq("2"), ttl, t0)

    // Required id 30 forces a refetch; the fetch dies; the readable cache
    // comes back — still missing 30 — and the status says so.
    val got = ItemMappingDim.loadWithStatus(
      cache, "dim-d-boom", Seq("2", "30"), ttl, t0.plus(Duration.ofMinutes(5)))
    assert(got.freshness == ItemMappingDim.StalePartial)
    assert(got.mapping.contains("2") && !got.mapping.contains("30"))
  }

  test("failed fetch with no cache is Unavailable: empty = cannot proceed") {
    MappingFetcher.register("dim-e-boom", () => sys.error("HTTP 503"))
    val got = ItemMappingDim.loadWithStatus(tempCache(), "dim-e-boom", Seq("2"), ttl, t0)
    assert(got.freshness == ItemMappingDim.Unavailable && got.mapping.isEmpty)
    // The reference-shaped `load` preserves the `return {}` signal.
    assert(ItemMappingDim.load(tempCache(), "dim-e-boom", Seq("2"), ttl, t0).isEmpty)
  }

  test("itemsToFetch splits dynamic overrides into fetchable and missing") {
    val mapping = Map("2" -> ItemMeta("2", "Cannonball"))
    val overrides = Seq(
      ValueOverride("Cannonball", Some(180L), Some("2")),
      ValueOverride("Ghost item", Some(1L), Some("99")),
      ValueOverride("Static item", Some(5L), None)) // not dynamic → skipped
    val (ok, missing) = ItemMappingDim.itemsToFetch(overrides, mapping)
    assert(ok == Seq(("Cannonball", "2")) && missing == Seq("99"))
  }

  test("toDim yields a broadcastable (item_id, item_name) dimension") {
    val df = ItemMappingDim.toDim(spark,
      Map("2" -> ItemMeta("2", "Cannonball"), "6" -> ItemMeta("6", "Cannon base")))
    assert(df.columns.toSeq == Seq("item_id", "item_name"))
    assert(df.count() == 2)
  }

  test("a name with embedded newline/tab round-trips the cache readable " +
      "(sanitized), keeping the stale fallback alive") {
    val calls = new AtomicInteger(0)
    MappingFetcher.register("dim-nl", () => {
      calls.incrementAndGet()
      Seq(ItemMeta("42", "Foo\nBar\tBaz"))
    })
    val cache = tempCache()
    val m1 = ItemMappingDim.load(cache, "dim-nl", Seq("42"), ttl, t0)
    assert(m1("42").name == "Foo\nBar\tBaz" && calls.get() == 1)
    // The rewritten cache must be READABLE: a warm load within TTL hits
    // the cache (sanitized name), never refetches.
    val m2 = ItemMappingDim.load(cache, "dim-nl", Seq("42"), ttl,
      t0.plus(Duration.ofHours(1)))
    assert(calls.get() == 1, "corrupt cache forced a refetch")
    assert(m2("42").name == "Foo Bar Baz")
  }
}
