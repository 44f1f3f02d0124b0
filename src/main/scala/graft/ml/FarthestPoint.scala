package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.KMeans.quantize

/** Farthest-point (max-min) diversity sampling — the greedy 2-approximate
  * k-center algorithm: repeatedly pick the point farthest from everything
  * already picked. The "maximally diverse eval set" / "coreset seed"
  * selector that uniform sampling can't replace (uniform oversamples
  * dense modes; FPS covers the embedding space).
  *
  * Same integer contract as [[KMeans]]: milli-unit quantized vectors,
  * exact squared distances, (distance DESC, id ASC) argmax — so the
  * selected set is bit-identical on every engine (`q_fps_sample` unrolls
  * the same rounds in DuckDB). Seed = smallest md5(id), like the k-means
  * seeds.
  *
  * Scale shape: each round is ONE map-only scoring pass against ≤ k
  * literal centers feeding a TakeOrdered(1) — no shuffle of the corpus,
  * k passes total (the honest greedy-FPS cost; for k beyond ~100 switch
  * to k-means‖-style oversampling, which [[KMeans]] seeds cover).
  */
object FarthestPoint {

  /** The k selected rows in pick order: (round, id, dist) where `dist` is
    * the squared quantized distance to the nearest EARLIER pick (0 for
    * the seed).
    */
  def sample(df: DataFrame, idCol: String, vecCol: String, k: Int,
      scale: Long = 1000L): DataFrame = {
    require(k >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), quantize(col(vecCol), scale).as("__q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = q
        .orderBy(md5(col("__id").cast("string").cast("binary")).asc, col("__id").asc)
        .limit(1).select(col("__id"), col("__q")).collect()
      if (seed.isEmpty) return Seq.empty[(Int, Long, Long)]
        .toDF("round", idCol, "dist")
      var centers = Vector((seed(0).getLong(0), vec(seed(0))))
      val x2 = graft.expr.VectorExprs.vecDot(col("__q"), col("__q"))
      for (r <- 1 until k) {
        val dists = centers.map { case (_, c) =>
          val cLit = typedlit(c.map(_.toDouble).toSeq)
          val c2 = c.map(v => v * v).sum
          x2 - lit(2.0) * graft.expr.VectorExprs.vecDot(col("__q"), cLit) +
            lit(c2.toDouble)
        }
        val next = q
          .withColumn("__dm", least(dists))
          .orderBy(col("__dm").desc, col("__id").asc)
          .limit(1).select(col("__id"), col("__q"), col("__dm")).collect()
        centers = centers :+ ((next(0).getLong(0), vec(next(0))))
      }
      // Re-derive each pick's min-dist for the output (seed = 0).
      val rows = centers.zipWithIndex.map { case ((id, v), r) =>
        val d = if (r == 0) 0L
          else centers.take(r).map { case (_, c) =>
            v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          }.min
        (r, id, d)
      }
      rows.toDF("round", idCol, "dist")
    } finally q.unpersist(false)
  }

  private def vec(r: org.apache.spark.sql.Row): Array[Long] =
    r.getSeq[Double](1).map(_.toLong).toArray

  /** `least` over 1+ columns (functions.least needs 2). */
  private def least(cs: Seq[Column]): Column =
    if (cs.size == 1) cs.head
    else org.apache.spark.sql.functions.least(cs: _*)
}
