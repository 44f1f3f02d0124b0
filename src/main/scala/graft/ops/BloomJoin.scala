package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered shuffle join: when the small side's key set is
  * selective but too large to broadcast the TABLE, broadcast a BLOOM
  * FILTER of its keys and drop non-matching big-side rows BEFORE the
  * shuffle. False positives just ride into the exact join and fall out —
  * the result is identical to a plain join, only the exchange shrinks by
  * the miss rate (at 100 TB, a fact table joining a 1%-selectivity
  * dimension shuffles ~1% of its bytes instead of all of them).
  *
  * This is the manual form of Spark's runtime row-group filtering, usable
  * when AQE's automatic injection doesn't fire (non-equi follow-ons,
  * pre-aggregated sides) — built on `bloom_filter_agg`/`might_contain`,
  * so the filter itself is a Tungsten aggregate, not driver state.
  */
object BloomJoin {

  /** Inner-join `big ⋈ small` on `keys`, with the big side bloom-pruned
    * first. `expectedItems`/`fpp` size the filter (bits ≈ n·ln(1/fpp)).
    */
  def filteredJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(keys.nonEmpty)
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, BloomFilterAggregate, Complete}
    // One composite 64-bit key: xxhash64 over the key columns on BOTH
    // sides (key types must match exactly, or the hashes won't).
    // BloomFilterAggregate/MightContain are the engine's own runtime-
    // filter machinery — not SQL-registered, so they are constructed
    // directly (same level as the AsOfJoin plan nodes).
    val numBits = (expectedItems * math.log(1.0 / fpp) /
      (math.log(2.0) * math.log(2.0))).toLong.max(64L)
    val bloomAgg = column(AggregateExpression(
      new BloomFilterAggregate(
        expression(xxhash64(keys.map(col): _*)),
        expression(lit(expectedItems)), expression(lit(numBits))),
      Complete, isDistinct = false))
    // `might_contain` requires its filter to be CONSTANT (that is how the
    // engine's own runtime filters inject it), so the aggregate runs as an
    // eager job and the serialized filter rides the plan as a literal —
    // sized by numBits (~1.2 MB at 1M items / 1% fpp), i.e. model-sized,
    // like any broadcast dimension digest. An empty small side yields a
    // NULL filter: might_contain(NULL, …) is NULL, so everything prunes.
    val bfRow = small.agg(bloomAgg.as("__bf")).head()
    val bf = if (bfRow.isNullAt(0)) lit(null).cast("binary")
      else lit(bfRow.getAs[Array[Byte]](0))
    val pruned = big.filter(column(BloomFilterMightContain(
      expression(bf), expression(xxhash64(keys.map(col): _*)))))
    pruned.join(small, keys)
  }
}
