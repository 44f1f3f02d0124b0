package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment, in exact integer
  * arithmetic — the standard quality gate over [[LabelPropagation]] (or
  * any clustering of a graph): Q = Σ_c [e_c/m − (d_c/2m)²] with e_c the
  * intra-community edge count and d_c the community's total degree.
  * Emitting per-community numerators q_num = 4·m·e_c − d_c² (so that
  * Q = Σ q_num / 4m²) keeps every value BIGINT: engines agree
  * bit-for-bit, and no float division order can split them.
  *
  * Scale shape: one distinct-canonicalization of the edge list, two
  * node-keyed joins attaching labels to endpoints, and two label-keyed
  * partial-agg'd shuffles (intra-edge counts, degree sums). The edge
  * count m rides in as a broadcast 1-row frame. Nothing is ever
  * collected; output is one row per community.
  */
object Modularity {

  /** Per-community modularity contributions over the undirected,
    * deduplicated form of `edges`, under `labels` (columns (node, label)).
    * Output: (label, e_intra, d_total, q_num) where
    * Q = Σ q_num / (4 m²); communities with no intra edges report
    * e_intra = 0. Nodes absent from `labels` are dropped with their
    * edges (a partial labeling scores its induced subgraph).
    *
    * The labeled edge list is scanned ONCE: each edge explodes into its
    * two endpoint contributions (intra-ness attributed to the first, so
    * an intra edge counts once) and a single label-keyed partial agg
    * yields both e_intra and d_total; m falls out of the per-label frame
    * (Σ d_total / 2) without touching the edges again. `labels` is
    * lazily checkpointed because both endpoint joins reference it — an
    * iteratively-computed labeling (label propagation) would otherwise
    * re-run its whole chain per reference.
    */
  def perCommunity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .filter(col("__a") =!= col("__b"))
      .distinct()
    val lab = labels.select(col("node"), col("label")).localCheckpoint(false)
    val la = lab.select(col("node").as("__a"), col("label").as("__la"))
    val lb = lab.select(col("node").as("__b"), col("label").as("__lb"))
    val labeled = e.join(la, Seq("__a")).join(lb, Seq("__b"))

    val isIntra = col("__la") === col("__lb")
    val perLabel = labeled
      .select(explode(array(
        struct(col("__la").as("label"),
          when(isIntra, 1L).otherwise(0L).as("intra")),
        struct(col("__lb").as("label"), lit(0L).as("intra")))).as("c"))
      .groupBy(col("c.label").as("label"))
      .agg(sum(col("c.intra")).as("e_intra"), count(lit(1)).as("d_total"))
      // Community-sized, referenced twice (m and the report) — truncate so
      // the edge scan runs once.
      .localCheckpoint(false)

    // Σ d_total counts each edge twice → m exactly; the division is on an
    // even integer, restored to BIGINT.
    val m = perLabel.agg((sum(col("d_total")) / 2).cast("long").as("__m"))

    // Integer-arithmetic bound, documented not silently exceeded: q_num
    // = 4·m·e_intra − d_total² stays in BIGINT while m ≲ 1.5e9 edges and
    // every community degree sum ≲ 3e9 (the Regression.groupTrend
    // convention — callers past that re-key into DECIMAL(38,0), trading
    // the oracle's exact-BIGINT parity for headroom).
    perLabel
      .crossJoin(broadcast(m))
      .select(col("label"), col("e_intra"), col("d_total"),
        (lit(4L) * col("__m") * col("e_intra") -
          col("d_total") * col("d_total")).as("q_num"))
  }
}
