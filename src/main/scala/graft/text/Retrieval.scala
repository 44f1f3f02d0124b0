package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — combining a sparse (BM25) and a dense
  * (embedding-cosine) ranking of the same corpus is the standard first
  * stage of a RAG / search pipeline, and reciprocal-rank fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009) is the fusion rule that
  * needs no score calibration: each list contributes `1 / (k + rank)`,
  * so only rank ORDER matters and wildly different score scales (BM25
  * vs cosine) fuse cleanly.
  *
  * Relational shape: each input ranking is already a bounded top-N per
  * query (the expensive part — BM25 scoring, ANN probe — happened
  * upstream), so fusion is a union of small lists plus one key-partitioned
  * aggregation. No all-pairs, no global sort: the final per-query top-k
  * is a per-key window over ≤ Σ Nᵢ candidates. At 100 TB the lists come
  * from the persisted inverted index ([[InvertedIndex]]/[[Bm25]]) and the
  * IVF index ([[graft.ops.IvfIndex]]); fusion cost is O(queries × N),
  * independent of corpus size.
  *
  * Reproducibility: the fused score is a sum of `1/(k+rank)` terms in a
  * FIXED list order (one conditional-max column per input list, summed
  * left to right) — a groupBy-sum over doubles would re-associate and
  * make cross-engine hashes flap.
  */
object Retrieval {

  /** Fuse ranked lists with reciprocal-rank fusion.
    *
    * Each input has columns (`idCol`, `rankCol`) with rank 1-based and
    * unique within the list. Returns (`idCol`, `rrf`) — unrounded; an
    * item absent from a list contributes 0 for it (the RRF convention
    * for truncated lists).
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as("__rank"),
        lit(i).as("__list"))
    }.reduce(_ unionByName _)
    // Pivot to one column per list, then sum in declaration order.
    val perList = rankings.indices.map { i =>
      max(when(col("__list") === i,
        lit(1.0) / (lit(kRrf.toDouble) + col("__rank")))).as(s"__c_$i")
    }
    val contrib = rankings.indices
      .map(i => coalesce(col(s"__c_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    tagged.groupBy(col(idCol)).agg(perList.head, perList.tail: _*)
      .select(col(idCol), contrib.as("rrf"))
  }
}
