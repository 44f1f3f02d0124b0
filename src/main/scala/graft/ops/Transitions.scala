package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-transition (Markov / path-analysis) matrix: how often does one
  * event type follow another within a user's ordered stream — the edge
  * weights behind sankey/flow dashboards and the transition
  * probabilities behind next-step prediction and anomalous-path
  * detection.
  *
  * Shape: ONE user-keyed window (lag over (ts, tie)) produces the
  * consecutive pairs, one partial-agg'd groupBy counts them, and the
  * per-source normalization joins a from-type-keyed count back —
  * from-type cardinality is the event vocabulary, so that join
  * broadcasts. No self-join of the event table, no per-user collect;
  * user partitions bound the window memory.
  */
object Transitions {

  /** (from_type, to_type, n, p) — `p` = n / Σ n over the same from_type,
    * rounded to 4. `gapSeconds`, when set, breaks transitions across
    * quiet gaps (a view → click 9 hours later is two visits, not a
    * transition — the sessionize boundary applied to pairs).
    * Deterministic under any partitioning: ordering is (ts, tieCols...).
    */
  def matrix(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, tieCols: Seq[String] = Seq.empty,
      gapSeconds: Option[Long] = None): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val paired = events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNotNull)
    // Microsecond-exact gap test (unix_timestamp would truncate to whole
    // seconds and disagree with any µs-precise engine at the boundary).
    val within = gapSeconds match {
      case Some(g) => paired.filter(
        unix_micros(col(tsCol)) - unix_micros(col("__prev_ts")) <= g * 1000000L)
      case None => paired
    }
    val counts = within
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__total"))
    counts.join(broadcast(fromTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("__total"), 4).as("p"))
  }
}
