package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkTestBase {

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // One hot key (0) carrying 80% of the big side.
    val big = ((1L to 400L).map(i => (0L, i)) ++
      (401L to 500L).map(i => (i % 7 + 1, i))).toDF("key", "row_id")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (8L, "unmatched"))
      .toDF("key", "label")

    val plain = big.join(small, Seq("key")).select("key", "row_id", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(big, small, Seq("key"), "row_id", numSalts = 8)
      .select("key", "row_id", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("left join preserves unmatched big-side rows exactly once") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i % 3, i)).toDF("key", "row_id")
    val small = Seq((0L, "zero")).toDF("key", "label")
    val out = SkewJoin.saltedJoin(big, small, Seq("key"), "row_id",
      numSalts = 4, joinType = "left")
    assert(out.count() == 100)
    assert(out.filter(col("label").isNull).count() == big.filter(col("key") =!= 0).count())
  }

  test("small-side-preserving join types are rejected") {
    import spark.implicits._
    val big = Seq((1L, 1L)).toDF("key", "row_id")
    val small = Seq((1L, "a")).toDF("key", "label")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("key"), "row_id", joinType = "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("key"), "row_id", joinType = "full_outer")
    }
    // semi/anti stay legal (big-side preserving).
    assert(SkewJoin.saltedJoin(big, small, Seq("key"), "row_id",
      joinType = "left_semi").count() == 1)
  }

  test("the hot key actually spreads across salt buckets") {
    import spark.implicits._
    val big = (1L to 1000L).map(i => (0L, i)).toDF("key", "row_id")
    val buckets = big
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(16)))
      .groupBy("__salt").count().collect()
    assert(buckets.length == 16) // all 16 buckets hit
    assert(buckets.map(_.getLong(1)).max < 1000 / 4) // no bucket dominates
  }
}
