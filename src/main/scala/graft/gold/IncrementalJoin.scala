package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-JOIN maintenance — the join-side dual of
  * [[IncrementalRollup]]: keep `J = A ⋈ B` current under append-only
  * deltas without re-joining history against history.
  *
  * The delta algebra (classic incremental view maintenance):
  * {{{
  *   (A ∪ dA) ⋈ (B ∪ dB) = A⋈B  ∪  dA⋈B  ∪  A⋈dB  ∪  dA⋈dB
  * }}}
  * so the NEW rows are three joins in which at least one side is an
  * increment. At 100 TB history / 100 GB day, that turns a full
  * history×history shuffle join into two broadcast probes of the stored
  * sides plus one tiny delta×delta join — increment size dominates. The
  * delta sides are explicitly `broadcast()` (that asymmetry is the whole
  * point); the stored sides stream by. Publish `J ∪ joinDelta(...)` via
  * [[GoldSink]] blue/green so readers never see a half-merged view.
  *
  * Append-only semantics: rows are only ever ADDED (retractions need
  * keyed upserts — that path is [[graft.streaming.StreamingGold]]).
  */
object IncrementalJoin {

  /** The rows `(A ∪ dA) ⋈ (B ∪ dB)` gains over `A ⋈ B`. Non-key columns
    * of the two sides must be disjoint (same contract as a plain
    * `join(…, keys)`).
    */
  def joinDelta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
      dB: DataFrame, keys: Seq[String]): DataFrame = {
    val aCols = aOld.columns.filterNot(keys.contains).toSeq
    val bCols = bOld.columns.filterNot(keys.contains).toSeq
    val overlap = aCols.intersect(bCols)
    require(overlap.isEmpty, s"non-key columns collide: ${overlap.mkString(", ")}")
    val ordered = (keys ++ aCols ++ bCols).map(col)
    broadcast(dA).join(bOld, keys).select(ordered: _*)
      .unionByName(aOld.join(broadcast(dB), keys).select(ordered: _*))
      .unionByName(broadcast(dA).join(dB, keys).select(ordered: _*))
  }
}
