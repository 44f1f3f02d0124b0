package graft.ops

import graft.SparkTestBase
import graft.ml.Pq
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF-PQ composition ([[Similarity.ivfPqTopK]]): coarse-quantizer
  * routing must be EXACTLY a candidate restriction — with the routing
  * opened wide it reproduces the plain two-stage ADC+rerank result
  * bit-for-bit, and with tight routing it still retrieves within-blob
  * on separated data.
  */
class IvfPqSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // Two far-apart blobs in 8 dims, 40 vectors: ids 0–19 near +5, 20–39
  // near −5; deterministic jitter.
  private def blobs: DataFrame =
    (0L until 40L).map { i =>
      val base = if (i < 20) 5.0f else -5.0f
      (i, Array.tabulate(8)(d =>
        base + (((i * 31L + d * 7L) % 11L) - 5L) / 10.0f))
    }.toDF("vec_id", "embedding")

  private def canon(df: DataFrame): Seq[(Long, Long, Int)] =
    df.select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("wide-open routing reproduces plain ADC+rerank exactly") {
    val df = blobs
    val model = Pq.fit(df, "vec_id", "embedding", dims = 8, m = 4, k = 3,
      iterations = 2)
    val codes = Pq.encode(df, "vec_id", "embedding", model)
    val probes = df.filter(col("vec_id") % 10 === 0)
    // centroidMod 4 → 10 centroids; nprobe 10 covers every list → the
    // IVF candidate set is ALL (probe, corpus) pairs minus self.
    val composed = Similarity.ivfPqTopK(probes, df, codes, "vec_id",
      "embedding", model, k = 3, candidateK = 8, centroidMod = 4,
      nprobe = 10)
    val plain = Pq.adcRerankTopK(probes, df, codes, "vec_id", "embedding",
      model, k = 3, candidateK = 8)
    assert(canon(composed) == canon(plain))
    assert(canon(composed).nonEmpty)
  }

  test("tight routing retrieves within-blob on separated blobs") {
    val df = blobs
    val model = Pq.fit(df, "vec_id", "embedding", dims = 8, m = 2, k = 2,
      iterations = 2)
    val codes = Pq.encode(df, "vec_id", "embedding", model)
    val probes = df.filter(col("vec_id").isin(0L, 25L))
    val got = Similarity.ivfPqTopK(probes, df, codes, "vec_id",
      "embedding", model, k = 3, candidateK = 10, centroidMod = 8,
      nprobe = 2).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = r.getLong(0); val n = r.getLong(1)
      assert((q < 20) == (n < 20), s"cross-blob neighbor: $q -> $n")
    }
  }

  test("candidateK below k is rejected") {
    val df = blobs
    val model = Pq.fit(df, "vec_id", "embedding", dims = 8, m = 2, k = 2,
      iterations = 1)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(df, df, Pq.encode(df, "vec_id", "embedding",
        model), "vec_id", "embedding", model, k = 5, candidateK = 3)
    }
  }
}
