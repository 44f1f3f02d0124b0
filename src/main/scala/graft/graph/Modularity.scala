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
    */
  def perCommunity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .filter(col("__a") =!= col("__b"))
      .distinct()
    val la = labels.select(col("node").as("__a"), col("label").as("__la"))
    val lb = labels.select(col("node").as("__b"), col("label").as("__lb"))
    val labeled = e.join(la, Seq("__a")).join(lb, Seq("__b"))

    val m = labeled.agg(count(lit(1)).as("__m"))

    val intra = labeled.filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label"))
      .agg(count(lit(1)).as("e_intra"))

    // Degree sums per community: each labeled edge contributes 1 to each
    // endpoint's community (2 to the community when intra).
    val degrees = labeled.select(col("__la").as("label"))
      .unionAll(labeled.select(col("__lb")))
      .groupBy("label").agg(count(lit(1)).as("d_total"))

    degrees
      .join(intra, Seq("label"), "left_outer")
      .na.fill(0L, Seq("e_intra"))
      .crossJoin(broadcast(m))
      .select(col("label"), col("e_intra"), col("d_total"),
        (lit(4L) * col("__m") * col("e_intra") -
          col("d_total") * col("d_total")).as("q_num"))
  }
}
