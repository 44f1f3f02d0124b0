package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic
  * deduplication by embedding — k-means buckets the corpus and cosine
  * near-duplicates are pruned ONLY within each cluster, never across the
  * whole corpus. The clustering is what makes embedding dedup scale: the
  * quadratic pair comparison is confined to cluster-sized blocks (pick
  * k ≈ corpus/expected-block so blocks stay bounded), the same
  * bucket-then-compare discipline as the MinHash-LSH family — an
  * all-pairs cosine over 100 TB of embeddings does not exist as a plan.
  *
  * Keep rule: a row is dropped when some LOWER-ID row in its cluster has
  * cosine similarity above `tau` — the deterministic keep-first
  * arbitration used by every dedup family here (no rand(), no
  * cluster-centroid distance ordering, stable under reruns and
  * repartitioning).
  */
object SemDedup {

  /** (id, cluster, kept) for every non-null-vector row.
    *
    * @param clusters (idCol, cluster) assignment — typically
    *                 [[graft.ml.KMeans.fitAssign]] output
    */
  def keepFlags(emb: DataFrame, idCol: String, vecCol: String,
      clusters: DataFrame, tau: Double): DataFrame = {
    val wc = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("__v"),
        Similarity.norm(col(vecCol)).as("__n"))
      .join(clusters.select(col(idCol).as("id"), col("cluster")), Seq("id"))
      // Referenced three times (both pair sides + the final flag join):
      // truncate so the embedding/cluster join runs once.
      .localCheckpoint(eager = false)
    val a = wc.select(col("cluster"), col("id").as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = wc.select(col("cluster"), col("id").as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    // Cluster-keyed equi-join: pair fan-out is per-cluster quadratic,
    // corpus-wide linear in Σ|cluster|² — the SemDeDup bound.
    val shadowed = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.dot(col("__va"), col("__vb")) /
        (col("__na") * col("__nb")) > tau)
      .select(col("id_b").as("id")).distinct()
    wc.select(col("id"), col("cluster"))
      .join(shadowed.withColumn("__s", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        (!coalesce(col("__s"), lit(false))).as("kept"))
  }

  /** SemDeDup keep flags from a CALLER-SUPPLIED scored pair stream —
    * typically a [[NnDescent]] kNN graph (cos already on every edge, so
    * no vector joins at all), or LSH/IVF candidate pairs. Same keep rule
    * as [[keepFlags]]: a row is shadowed when any pair above `tau` links
    * it to a lower id — pair direction is irrelevant, the larger id of a
    * τ-edge always loses. The kNN-graph feed is the scale path the
    * SemDeDup paper's k-means blocking approximates from the other side:
    * a k-capped graph bounds the pair stream at n·k rows regardless of
    * how lopsided the clusters are.
    *
    * @param ids universe of rows to flag (rows with no τ-pair are kept)
    */
  def keepFlagsFromPairs(ids: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, simCol: String, tau: Double): DataFrame = {
    val shadowed = pairs.filter(col(simCol) > tau)
      .select(greatest(col(aCol), col(bCol)).as("id")).distinct()
    ids.select(col(idCol).as("id")).distinct()
      .join(shadowed.withColumn("__s", lit(true)), Seq("id"), "left")
      .select(col("id"), (!coalesce(col("__s"), lit(false))).as("kept"))
  }
}
