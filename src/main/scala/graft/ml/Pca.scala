package graft.ml

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expr.CovarianceAgg
import graft.ops.Similarity

/** Principal component analysis over an embedding column.
  *
  * Fit is one distributed pass: [[graft.expr.CovarianceAgg]] reduces the
  * table to (n, Σx, Σxxᵀ) — a single ~d²/2-double buffer per partition on
  * the wire — and the d×d eigenproblem is solved on the driver with cyclic
  * Jacobi (d is an embedding dimension, 64–4096; the O(d³) solve is
  * microseconds-to-seconds and independent of row count). This is the
  * standard big-data PCA split: sufficient statistics distributed,
  * model-sized algebra local, mirroring how the k-means and PQ fitters in
  * this package keep only model-sized state on the driver.
  *
  * Transform is a map-only projection through the codegen'd vector dot
  * ([[graft.ops.Similarity.dot]]) against literal component vectors — no
  * shuffle, no UDF; the centering term folds into a per-component constant
  * because dot(x − μ, v) = dot(x, v) − dot(μ, v).
  *
  * Sign convention: each component's largest-magnitude coordinate is made
  * positive (ties → lowest index), so repeated fits emit reproducible
  * directions even though eigenvectors are sign-ambiguous.
  */
object Pca {

  /** `components(i)` is the i-th principal axis (descending eigenvalue);
    * `eigenvalues` are the corresponding population covariance variances.
    */
  case class Model(
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def d: Int = mean.length
    def k: Int = components.length
  }

  /** Fit a k-component model from `df(vecCol)` (array<float|double>,
    * uniform length). Population covariance (divide by n); requires n ≥ 2.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    val agg = GraftColumnBridge.column(
      CovarianceAgg(GraftColumnBridge.expression(df.col(vecCol)))
        .toAggregateExpression())
    val row = df.select(agg.as("s")).select("s.n", "s.sums", "s.prods").head()
    require(!row.isNullAt(0), "PCA fit over an empty table")
    val n = row.getLong(0)
    require(n >= 2, s"PCA fit needs at least 2 rows, got $n")
    val sums = row.getSeq[Double](1).toArray
    val prods = row.getSeq[Double](2).toArray
    val d = sums.length
    require(k <= d, s"k=$k exceeds dimension $d")

    val mean = sums.map(_ / n)
    // cov(i,j) = Σxixj/n − μiμj, unpacked from the upper triangle.
    val cov = Array.ofDim[Double](d, d)
    var p = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = prods(p) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        p += 1
        j += 1
      }
      i += 1
    }

    val (vals, vecs) = Jacobi.symmetricEigen(cov)
    val order = vals.indices.sortBy(ix => (-vals(ix), ix)).take(k)
    val components = order.map { ix =>
      val v = Array.tabulate(d)(r => vecs(r)(ix))
      // Deterministic sign: dominant coordinate positive.
      var best = 0
      var bi = 1
      while (bi < d) {
        if (math.abs(v(bi)) > math.abs(v(best))) best = bi
        bi += 1
      }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    Model(mean, order.map(ix => vals(ix)).toArray, components)
  }

  /** Append centered projections `<prefix>0 … <prefix>{k-1}` to `df`. */
  def project(df: DataFrame, vecCol: String, model: Model,
      prefix: String = "pc"): DataFrame = {
    val projections = model.components.zipWithIndex.map { case (v, i) =>
      val offset = v.zip(model.mean).map { case (a, b) => a * b }.sum
      (Similarity.dot(col(vecCol), lit(v)) - lit(offset)).as(s"$prefix$i")
    }
    df.select(col("*") +: projections: _*)
  }

  /** PCA whitening: centered projections scaled to unit variance
    * (component i divided by √(λᵢ + eps)) — the decorrelate-and-equalize
    * transform in front of distance-based methods (k-means, ANN) whose
    * metrics otherwise overweight high-variance directions. Same map-only
    * plan as [[project]]; `eps` guards near-zero eigenvalues.
    */
  def whiten(df: DataFrame, vecCol: String, model: Model,
      prefix: String = "wc", eps: Double = 1e-9): DataFrame = {
    val scaled = model.components.zipWithIndex.map { case (v, i) =>
      val offset = v.zip(model.mean).map { case (a, b) => a * b }.sum
      val scale = 1.0 / math.sqrt(model.eigenvalues(i) + eps)
      ((Similarity.dot(col(vecCol), lit(v)) - lit(offset)) * lit(scale))
        .as(s"$prefix$i")
    }
    df.select(col("*") +: scaled: _*)
  }
}

/** Cyclic Jacobi eigendecomposition for small symmetric matrices (the
  * driver-side half of [[Pca]]): repeatedly rotates away the largest
  * off-diagonal mass until convergence. O(d³) per sweep, a handful of
  * sweeps in practice; numerically robust for the well-conditioned
  * covariance matrices embeddings produce.
  */
private[ml] object Jacobi {

  /** Returns (eigenvalues, V) with A·V = V·diag(values); V's COLUMNS are
    * the eigenvectors. Input is copied, not mutated.
    */
  def symmetricEigen(aIn: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiagNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }

    val scale = {
      var m = 0.0
      var i = 0
      while (i < d) { m = math.max(m, math.abs(a(i)(i))); i += 1 }
      math.max(m, 1e-300)
    }

    var sweep = 0
    while (sweep < maxSweeps && offDiagNorm() > tol * scale * d) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // Standard Jacobi rotation zeroing a(p,q).
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
