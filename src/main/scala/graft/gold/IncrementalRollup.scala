package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-rollup maintenance: keep a running aggregate table
  * current by merging each new increment's PARTIAL aggregates instead of
  * rescanning history — the only shape that stays viable when "history"
  * is 100 TB and today is 100 GB.
  *
  * Works for any algebraic aggregate carried as mergeable state: here
  * count + sum (avg = total/cnt at read time; min/max merge the same
  * way). The merge is one union + one partial-agg'd shuffle keyed by the
  * rollup keys — increment size, not history size, dominates the scan,
  * and the state table stays one row per key. Publish each merged state
  * via [[GoldSink]] blue/green so readers never see a half-merged table.
  */
object IncrementalRollup {

  /** Partial aggregate of one increment of facts: keys + cnt + total.
    * `total` is DECIMAL(28,2) — sum(decimal(18,2))'s natural result —
    * and [[merge]] preserves exactly that type, so state tables written
    * by either producer share one parquet schema (mixed-type state dirs
    * break merged reads, the Evolution.scala note).
    */
  def incrementOf(facts: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    facts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total"))

  /** Merge the running state with a new increment (both in the
    * keys+cnt+total shape). Decimal totals merge exactly, so N
    * incremental merges are bit-identical to one full recompute.
    * The merged sum re-normalizes to DECIMAL(28,2) — the increment
    * shape — NOT down to (18,2): a running total past 10^16 is
    * plausible at the scale this exists for, and a narrowing cast
    * would turn the overflow into a silent NULL that every later
    * merge's sum then ignores, permanently corrupting the rollup;
    * (28,2) holds 10^26, unreachable from any real fact stream.
    */
  def merge(state: DataFrame, increment: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(Set("cnt", "total")).toSeq
    state.unionByName(increment)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).cast("decimal(28,2)").as("total"))
  }
}
