package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-storage contract: a join between two tables bucketed on
  * the join key plans with NO Exchange (the shuffle was paid once at
  * write time), and the result matches the plain join. The physical
  * plan is part of the contract — at 100 TB the absent exchange IS the
  * feature.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def facts = (0L until 1000L)
    .map(i => (i % 97, i, (i * 7) % 100)).toDF("k", "fact_id", "qty")
  private def dim = (0L until 97L).map(i => (i, s"name_$i")).toDF("k", "name")

  test("bucketed-both-sides equi-join plans without any Exchange") {
    spark.sql("DROP TABLE IF EXISTS bj_facts")
    spark.sql("DROP TABLE IF EXISTS bj_dim")
    Bucketing.writeBucketed(facts, "bj_facts", "k", buckets = 8)
    Bucketing.writeBucketed(dim, "bj_dim", "k", buckets = 8)
    // Disable broadcast so the join shape under test is the shuffle one
    // bucketing is supposed to eliminate.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = Bucketing.read(spark, "bj_facts")
        .join(Bucketing.read(spark, "bj_dim"), "k")
        .groupBy("name").agg(sum("qty").as("q"))
      val joinPlan = j.queryExecution.executedPlan.toString
      val joinPart = joinPlan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"exchange under the bucketed join:\n$joinPlan")
      // Same rows as the plain (shuffling) join.
      val plain = facts.join(dim, "k").groupBy("name")
        .agg(sum("qty").as("q"))
      assert(j.collect().toSet == plain.collect().toSet)
    }
  }

  test("one unbucketed side still exchanges exactly that side") {
    spark.sql("DROP TABLE IF EXISTS bj_facts2")
    Bucketing.writeBucketed(facts, "bj_facts2", "k", buckets = 8)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = Bucketing.read(spark, "bj_facts2").join(dim, "k")
      val plan = j.queryExecution.executedPlan.toString
      val n = plan.split('\n').count(_.contains("Exchange hashpartitioning"))
      assert(n == 1, s"expected exactly one exchange (the unbucketed side):\n$plan")
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
