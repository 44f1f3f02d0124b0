package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FarthestPointSpec extends AnyFunSuite with SparkTestBase {

  test("three separated blobs: the first three picks cover all three blobs") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (0 until 3).flatMap { b =>
      (0 until 20).map { i =>
        ((b * 20 + i).toLong, Array.tabulate(4)(d =>
          (b * 30.0 + (if (d == 0) 0 else b * 5) + rng.nextGaussian() * 0.2).toFloat))
      }
    }
    val picks = FarthestPoint.sample(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3)
      .collect().map(_.getLong(1))
    assert(picks.map(_ / 20).toSet == Set(0L, 1L, 2L))
  }

  test("min-dist sequence is non-increasing; rerun and repartition stable") {
    import spark.implicits._
    val rows = (0L until 60L).map(i =>
      (i, Array.tabulate(6)(d => (((i * 37 + d * 11) % 100) / 10.0f))))
    val df = rows.toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      FarthestPoint.sample(d, "vec_id", "embedding", 6)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val a = run(df)
    // Greedy max-min: each later pick's distance can only shrink or hold.
    val dists = a.drop(1).map(_._3)
    assert(dists == dists.sorted.reverse)
    assert(a == run(df.repartition(9)))
  }

  test("k exceeding the corpus keeps selecting; empty corpus yields empty") {
    import spark.implicits._
    val two = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    // k=4 over 2 rows: rounds 2+ re-pick at dist 0 (degenerate but total).
    val out = FarthestPoint.sample(two, "vec_id", "embedding", 4).collect()
    assert(out.length == 4)
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(FarthestPoint.sample(empty, "vec_id", "embedding", 3).count() == 0)
  }
}
