package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns: reduce
  * a d-dim vector to k dims through a fixed pseudo-random matrix,
  * preserving pairwise distances to within 1±ε with high probability
  * (Johnson & Lindenstrauss 1984; Achlioptas 2003 for the database-
  * friendly ±1 variant). This is the cheap first stage of embedding
  * pipelines at corpus scale — shrink 100 TB of float vectors 4× before
  * clustering/ANN/SemDeDup, with a bound on how much geometry it costs.
  *
  * Spark shape: the k×d matrix is DERIVED, not stored — component
  * (j, d) = md5("rp_<j>_<d>")/2⁵⁹ − 1 ∈ [−1, 1), the same
  * engine-reproducible construction as [[Similarity.md5PlaneComponents]]
  * — so every executor (and the DuckDB oracle) materializes identical
  * planes from a tag string, and the projection is ONE codegen'd
  * map-only expression ([[graft.expr.PlaneProject]]) per row: no
  * broadcast, no shuffle, no state. Scaling by √(d/k)·(√3/σ-ish) is left
  * to the caller's eval — distance RATIOS are what JL bounds, and the
  * distortion query checks exactly that.
  */
object RandomProjection {

  /** The derived k×d projection matrix (row-major). Deterministic in
    * (tag, k, d); any engine with md5 rebuilds it bit-identically. Rows
    * come from [[Similarity.md5Components]] — the one copy of the
    * component recipe shared with the LSH planes.
    */
  def matrix(outDim: Int, dims: Int, tag: String = "rp"): Array[Array[Double]] =
    Array.tabulate(outDim)(j => Similarity.md5Components(tag, j, dims))

  /** Projected vector column (array<double>, length `outDim`). */
  def project(vec: Column, outDim: Int, dims: Int,
      tag: String = "rp"): Column =
    graft.expr.VectorExprs.planeProject(vec, matrix(outDim, dims, tag))

  /** Distance-distortion eval over a deterministic probe subset: for
    * every pair (a < b) with id < `probeIds`, the squared-distance ratio
    * ‖p(a)−p(b)‖²·3/k / ‖a−b‖² — the quantity JL bounds around 1 (the 3
    * is 1/Var of the uniform[−1,1) matrix entries, making the estimator
    * unbiased: E‖p(Δ)‖² = k·Var·‖Δ‖²). Identical-vector pairs (zero
    * denominator) are dropped. The pair join is probe×probe only; the
    * corpus-wide projection itself stays map-only.
    */
  def distortion(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dims: Int, probeIds: Long,
      tag: String = "rp"): DataFrame = {
    val p = df
      .filter(col(idCol) < probeIds && col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"),
        project(col(vecCol), outDim, dims, tag).as("__p"))
    def sqDist(a: Column, b: Column): Column = {
      val diff = zip_with(a, b, (x, y) => x - y)
      graft.expr.VectorExprs.vecDot(diff, diff)
    }
    p.alias("a").join(p.alias("b"),
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        sqDist(col("a.__v"), col("b.__v")).as("__d2"),
        sqDist(col("a.__p"), col("b.__p")).as("__p2"))
      .filter(col("__d2") > 0)
      .select(col("id_a"), col("id_b"),
        (col("__p2") * lit(3.0) / (lit(outDim) * col("__d2"))).as("ratio"))
  }
}
