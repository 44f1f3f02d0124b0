package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** DBSCAN density clustering (Ester et al., KDD'96), re-expressed
  * relationally over a PRECOMPUTED eps-neighbor pair table — the density
  * companion to k-means (which force-assigns every point) and SemDeDup:
  * dense regions become clusters, sparse points become NOISE, which is
  * exactly the "keep the modes, flag the stragglers" read a curation
  * pipeline wants from an embedding space.
  *
  * Classic DBSCAN is sequential (border points join whichever cluster's
  * scan reaches them first). This formulation is the deterministic
  * lattice-fixed variant:
  *   - CORE: |N_eps(p)| ≥ minPts, counting p itself (the paper's
  *     definition);
  *   - clusters = connected components of the CORE-CORE subgraph
  *     (density-connectedness restricted to cores — identical to the
  *     paper's clusters on core points);
  *   - BORDER: a non-core with ≥ 1 core neighbor joins the MINIMUM
  *     component id among its core neighbors (run-order-free where the
  *     original is first-scan-wins);
  *   - NOISE: everything else.
  *
  * The eps-neighborhood is an INPUT (`pairs`), not computed here: at
  * oracle/test scale it comes from [[graft.ops.Dedup.embeddingNearDupBrute]],
  * at 100 TB from the LSH/IVF candidate generators — exactly the seam the
  * near-dup clustering pipeline already uses, so density clustering
  * inherits whatever blocking quality the caller can afford.
  *
  * Scale shape: one degree count (partial-agg'd), two semi-joins to
  * restrict edges to core-core, large-star/small-star components
  * ([[Dedup.connectedComponents]] — never materializes a component), one
  * keyed join for border attachment. Nothing all-pairs, nothing driver-
  * sized; a hot point costs a shuffle-partition aggregate.
  */
object Dbscan {

  /** Per-point (id, role ∈ core|border|noise, cluster) — `cluster` is the
    * minimum member id of the point's cluster, NULL for noise.
    *
    * @param points distinct point ids (idCol) — needed so isolated points
    *               (no pair at all) still land as noise rows
    * @param pairs  undirected eps-neighbor pairs (aCol, bCol), each
    *               unordered pair once; self-pairs not required
    * @param minPts the paper's density threshold, INCLUDING the point
    *               itself (minPts = 4 means "3 neighbors within eps")
    */
  def cluster(
      points: DataFrame,
      pairs: DataFrame,
      idCol: String,
      aCol: String,
      bCol: String,
      minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val sym = pairs.select(col(aCol).as("__u"), col(bCol).as("__v"))
      .unionAll(pairs.select(col(bCol).as("__u"), col(aCol).as("__v")))
      // Referenced by the degree count, two core restrictions, and the
      // border join: truncate so the pair source evaluates once.
      .localCheckpoint(eager = false)
    // Degrees over ALL points, not just paired ones: an isolated point
    // has |N_eps| = 1 (itself) and must still qualify when minPts <= 1.
    val deg = points.select(col(idCol).as("__u")).distinct()
      .join(sym.groupBy(col("__u")).agg(count(lit(1)).as("__deg")),
        Seq("__u"), "left")
      .withColumn("__deg", coalesce(col("__deg"), lit(0L)))
    // +1: the point itself is in its own eps-neighborhood.
    val cores = deg.filter(col("__deg") + 1 >= minPts)
      .select(col("__u").as("__core"))
    val coreEdges = sym
      .join(cores.withColumnRenamed("__core", "__u"), Seq("__u"), "left_semi")
      .join(cores.withColumnRenamed("__core", "__v"), Seq("__v"), "left_semi")
    val comps = Dedup.connectedComponents(coreEdges, "__u", "__v")
      .withColumnRenamed("id", "__core").withColumnRenamed("component", "__comp")
    // An isolated core (dense purely via border neighbors) seeds its own
    // cluster: component defaults to the core's own id.
    val coreClusters = cores
      .join(comps, Seq("__core"), "left")
      .select(col("__core"),
        coalesce(col("__comp"), col("__core")).as("__cluster"))
    // Border attachment: minimum cluster id among the point's CORE
    // neighbors — deterministic where the original is first-scan-wins.
    val borderClusters = sym
      .join(coreClusters.withColumnRenamed("__core", "__v"), Seq("__v"))
      .join(cores.withColumnRenamed("__core", "__u"), Seq("__u"), "left_anti")
      .groupBy(col("__u")).agg(min(col("__cluster")).as("__bcluster"))
    points.select(col(idCol).as("id")).distinct()
      .join(coreClusters.withColumnRenamed("__core", "id"), Seq("id"), "left")
      .join(borderClusters.withColumnRenamed("__u", "id"), Seq("id"), "left")
      .select(col("id"),
        when(col("__cluster").isNotNull, "core")
          .when(col("__bcluster").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("__cluster"), col("__bcluster")).as("cluster"))
  }
}
