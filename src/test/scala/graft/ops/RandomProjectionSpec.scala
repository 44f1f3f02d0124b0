package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RandomProjectionSpec extends AnyFunSuite with SparkTestBase {

  private def vecs(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { id =>
      (id.toLong, Array.tabulate(dim)(d =>
        (((id * 31 + d * 7) % 97) / 97.0f - 0.5f)))
    }.toDF("vec_id", "embedding")
  }

  test("projected components equal the literal matrix-vector product") {
    val df = vecs(8, 32)
    val m = RandomProjection.matrix(outDim = 4, dims = 32)
    val got = df.select(col("vec_id"),
        RandomProjection.project(col("embedding"), 4, 32).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for ((id, v) <- raw; j <- 0 until 4) {
      var acc = 0.0
      for (d <- 0 until 32) acc += v(d).toDouble * m(j)(d)
      assert(math.abs(got(id)(j) - acc) < 1e-12, s"vec $id comp $j")
    }
  }

  test("matrix is deterministic in (tag, k, d) and differs across tags") {
    val a = RandomProjection.matrix(3, 8)
    val b = RandomProjection.matrix(3, 8)
    val c = RandomProjection.matrix(3, 8, tag = "other")
    assert(a.flatten.toSeq === b.flatten.toSeq)
    assert(a.flatten.toSeq !== c.flatten.toSeq)
    assert(a.flatten.forall(x => x >= -1.0 && x < 1.0))
  }

  test("JL concentration: distance ratios center near 1 with bounded spread") {
    // One shared matrix sample correlates all pair ratios, so the mean
    // can sit off 1 by O(1/sqrt(k)); assert a correspondingly loose
    // center plus a hard envelope no ratio may escape.
    import spark.implicits._
    val df = (0 until 40).map { id =>
      (id.toLong, Array.tabulate(64)(d =>
        (((id * 2654435761L + d * 40503L + id * d * 97L) % 1000L) / 1000.0f
          - 0.5f)))
    }.toDF("vec_id", "embedding")
    val rows = RandomProjection.distortion(df, "vec_id", "embedding",
      outDim = 16, dims = 64, probeIds = 40).collect()
    assert(rows.length === 40 * 39 / 2)
    val ratios = rows.map(_.getAs[Double]("ratio"))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.6 && mean < 1.6, s"mean ratio $mean drifted")
    assert(ratios.forall(r => r > 0.1 && r < 5.0),
      s"ratio outside loose JL envelope: ${ratios.min} .. ${ratios.max}")
  }

  test("null vectors are dropped from projection and distortion") {
    import spark.implicits._
    val df = Seq((0L, Some(Array(1.0f, 0.0f))), (1L, None),
      (2L, Some(Array(0.0f, 1.0f)))).toDF("vec_id", "embedding")
    val p = df.filter(col("embedding").isNotNull)
      .select(RandomProjection.project(col("embedding"), 2, 2))
    assert(p.count() === 2)
    val d = RandomProjection.distortion(df, "vec_id", "embedding", 2, 2, 10)
    assert(d.count() === 1) // only the (0,2) pair; 1 is null
  }

  test("identical vectors (zero distance) are excluded from distortion") {
    import spark.implicits._
    val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val pairs = RandomProjection.distortion(df, "vec_id", "embedding", 2, 2, 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((0L, 2L), (1L, 2L)))
  }
}
