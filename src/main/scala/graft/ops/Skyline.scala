package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline / Pareto-front operator (Börzsönyi et al., ICDE'01): the rows
  * not DOMINATED by any other row, where b dominates a iff b ≥ a on every
  * dimension and > on at least one. The multi-criteria "best documents"
  * selection (longest AND most lexically diverse, cheapest AND fastest…)
  * that a naive formulation writes as an O(n²) NOT EXISTS self-join.
  *
  * 2D maximizing case has a sort-based O(n log n) plan: group to one row
  * per distinct d1 (partial-agg'd max of d2), then one running-max sweep
  * over the DISTINCT-d1 table — a d1 value survives iff its d2-max beats
  * every d2-max at strictly greater d1. Facts are never globally sorted:
  * the sweep's single-partition window touches only |distinct d1| rows,
  * and survivors broadcast back to tag front rows. Ties survive together
  * (equal points do not dominate each other).
  */
object Skyline {

  /** Pareto front maximizing integer dimensions (d1, d2): returns the
    * input rows that are on the front.
    */
  def front2d(df: DataFrame, d1: String, d2: String): DataFrame = {
    val perD1 = df.groupBy(col(d1)).agg(max(col(d2)).as("__gmax"))
    val sweep = Window.orderBy(col(d1).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val kept = perD1
      .withColumn("__prev", max(col("__gmax")).over(sweep))
      .filter(col("__prev").isNull || col("__gmax") > col("__prev"))
      .select(col(d1), col("__gmax"))
    df.join(broadcast(kept), Seq(d1))
      .filter(col(d2) === col("__gmax"))
      .drop("__gmax")
  }

  /** d-dimensional Pareto front, maximizing every integer dimension.
    * Dispatches to the O(n log n) [[front2d]] sweep for two dimensions;
    * otherwise runs the distributed sort-filter-skyline (SFS, Chomicki
    * et al. ICDE'03) two-phase plan:
    *
    *   1. LOCAL front per partition: rows sorted within the partition by
    *      descending coordinate sum, then one scan keeping a row iff no
    *      already-kept row dominates it. Sum-descending order makes the
    *      scan EXACT with a grow-only kept set — a dominator has ≥ on
    *      every dimension and > on one, hence a strictly larger sum, so
    *      it always precedes anything it dominates (equal-sum rows can
    *      never dominate each other). No shuffle; each partition reduces
    *      to its own front.
    *   2. GLOBAL front of the union of local fronts — correct because a
    *      globally undominated row is undominated in its own partition,
    *      so phase 1 never discards a front row. The union is
    *      front-sized, not data-sized; it coalesces to ONE bounded
    *      executor task (same finish discipline as the dedup family's
    *      union-find: a single task, never a driver collect) and runs
    *      the identical sorted scan.
    *
    * Memory bound, stated: phase 1 holds one partition's FRONT (not the
    * partition); phase 2 holds the union of local fronts. Pathologically
    * anti-correlated dimensions make fronts O(n) — that is intrinsic to
    * the operator's output size, not this plan.
    *
    * Rows with a NULL in any dimension are dropped (a NULL coordinate
    * can neither dominate nor be ranked — same policy as the similarity
    * family). Duplicate coordinate vectors survive together. Dimension
    * values must fit LONG; the sum ordering uses exact long arithmetic.
    */
  def front(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.size >= 2, s"need >= 2 dimensions, got ${dims.size}")
    if (dims.size == 2) return front2d(df, dims.head, dims.last)

    val clean = df.filter(dims.map(col(_).isNotNull).reduce(_ && _))
    val withV = clean
      .withColumn("__v", array(dims.map(col(_).cast("long")): _*))
      .withColumn("__s", dims.map(col(_).cast("long")).reduce(_ + _))
    val schema = withV.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val vIdx = schema.fieldIndex("__v")

    def dominates(a: IndexedSeq[Long], b: IndexedSeq[Long]): Boolean = {
      var gt = false
      var i = 0
      while (i < a.length) {
        if (a(i) < b(i)) return false
        if (a(i) > b(i)) gt = true
        i += 1
      }
      gt
    }

    def sfsScan(it: Iterator[org.apache.spark.sql.Row])
        : Iterator[org.apache.spark.sql.Row] = {
      val front = scala.collection.mutable.ArrayBuffer
        .empty[IndexedSeq[Long]]
      it.filter { r =>
        val v = r.getSeq[Long](vIdx).toIndexedSeq
        val dominated = front.exists(f => dominates(f, v))
        if (!dominated) front += v
        !dominated
      }
    }

    val local = withV
      .sortWithinPartitions(col("__s").desc)
      .mapPartitions(sfsScan)(enc)
    local
      .coalesce(1)
      .sortWithinPartitions(col("__s").desc)
      .mapPartitions(sfsScan)(enc)
      .drop("__v", "__s")
  }
}
