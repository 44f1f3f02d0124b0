package graft

import graft.expr.{ParseDuration, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * makes `parse_duration(str)` and `vec_dot(a, b)` available to plain SQL
  * alongside the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("parse_duration"),
      new ExpressionInfo(classOf[ParseDuration].getName, "parse_duration"),
      (children: Seq[Expression]) => ParseDuration(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    // Custom whole-operator plan: as-of join (graft.plans.AsOfJoinPlan →
    // co-partitioned sort-merge AsOfJoinExec).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  /** Runtime registration into an already-built session (the extensions
    * class only applies at session build; this covers notebook/REPL use).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_duration", exprs => ParseDuration(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
  }
}
