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
}
