package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.,
  * 2007) — the cheap community signal next to [[PageRank]] and
  * [[Triangles]]: site/domain clusters in a link graph, co-interaction
  * cohorts in an event graph.
  *
  * Determinism (classic LPA is run-order-dependent; this one is not):
  * SYNCHRONOUS rounds (every node updates from the previous round's
  * labels), majority vote over neighbor labels with ties broken toward
  * the SMALLEST label, isolated nodes keep their own label. Every step is
  * integer counting and total-ordered argmax — bit-identical on any
  * engine/partitioning, which is what puts 3 rounds under the DuckDB
  * oracle gate (`q_label_prop`).
  *
  * Scale shape per round: one join keyed on the edge source (labels are
  * a slim (node, label) table) and one partially-aggregated shuffle keyed
  * on (node, label) for the vote, then an argmax via `max_by` — which
  * partial-aggregates too, so the exchange carries one row per (node,
  * label), never per edge. Like PageRank, the edge table is loop-invariant
  * (cache it at scale); rounds are a fixed small constant.
  */
object LabelPropagation {

  /** (node, label) after `rounds` synchronous updates over the undirected
    * version of `edges` (self-loops dropped, multi-edges collapsed —
    * each NEIGHBOR votes once).
    */
  def communities(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    // The min-label tie-break below negates the label — only meaningful
    // for NUMERIC node ids. A string id would negate to NULL (non-ANSI),
    // silently degrading the documented determinism to
    // partitioning-dependent tie-breaks; fail loudly instead.
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType)
        .contains(edges.schema(srcCol).dataType),
      s"node ids must be integral for the deterministic min-label " +
        s"tie-break, got ${edges.schema(srcCol).dataType} — assign " +
        "numeric ids first (ops.Ordinals.assign)")
    require(rounds >= 0, "rounds must be >= 0")
    // Undirected neighbor pairs, deduped: (v, u) for every edge {u, v}.
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .filter(col("__a") =!= col("__b"))
      .distinct()
    // Loop-invariant frames, lazily checkpointed: every round re-reads
    // nbrs/nodes, and without lineage truncation round r's plan contains
    // r copies of the whole edge pipeline (the connectedComponents trick).
    val nbrs = und.select(col("__a").as("node"), col("__b").as("__nbr"))
      .unionAll(und.select(col("__b").as("node"), col("__a").as("__nbr")))
      .localCheckpoint(false)
    val nodes = nbrs.select(col("node")).distinct().localCheckpoint(false)

    var labels = nodes.select(col("node"), col("node").as("label"))
    // Round r−1's label checkpoint is dead once round r materializes:
    // release it immediately (the connectedComponents discipline) rather
    // than pinning every round's label table for the session. nbrs/nodes
    // stay live by design — every round AND the final plan read them.
    var prevCkpt: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val votes = nbrs
        .join(labels.select(col("node").as("__nbr"), col("label")), "__nbr")
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("__votes"))
        .groupBy(col("node"))
        .agg(max_by(col("label"),
          struct(col("__votes"), (-col("label")).as("__tb"))).as("__new"))
      labels = nodes
        .join(votes, Seq("node"), "left")
        // An isolated node has no votes: it keeps itself.
        .select(col("node"), coalesce(col("__new"), col("node")).as("label"))
      // Intermediate rounds truncate lineage EAGERLY (round r's plan
      // stays O(1), not O(r), and materializing now is what proves the
      // previous round dead); the LAST round stays a plain plan so
      // callers — and the plan-shape audit — still see the vote/argmax
      // aggregation.
      if (r < rounds) {
        labels = labels.localCheckpoint(true)
        prevCkpt.foreach(graft.ops.Checkpoints.release)
        prevCkpt = Some(labels)
      }
    }
    labels
  }
}
