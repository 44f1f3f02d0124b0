package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `new Column(Expression)` constructor (Column
  * is now backed by a ColumnNode); the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql].
  * This bridge re-exports the two conversions for graft's custom Catalyst
  * expressions — the standard extension-library trick.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — `classic.Dataset.ofRows`
    * is private[sql]; custom logical nodes (graft.plans.*) need it to enter
    * the Dataset API.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (attribute-resolved, pre-optimizer),
    * the form custom plan constructors compose over.
    */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The RDD behind a `Dataset.localCheckpoint` result (its analyzed plan is
    * a `LogicalRDD` over the persisted internal-row RDD). Gives iterative
    * operators an explicit release handle: `Dataset.unpersist` only reaches
    * the catalog cache, so without this the checkpoint blocks of every
    * round linger until the async GC-driven ContextCleaner notices the dead
    * RDD — across a many-query session that is an unbounded storage leak.
    * None for plans that are not checkpoint roots.
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case r: execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }

  /** Every checkpoint-backed RDD anywhere in a frame's analyzed plan
    * (including inside subqueries) — the handle for checkpoints an
    * operator left buried under projections before returning.
    */
  def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectWithSubqueries {
      case r: execution.LogicalRDD => r.rdd
    }.distinct
}
