package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PcaSpec extends AnyFunSuite with SparkTestBase {

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("Jacobi recovers the closed-form eigensystem of [[2,1],[1,2]]") {
    val (vals, vecs) = Jacobi.symmetricEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-10)
    assert(math.abs(sorted(1) - 3.0) < 1e-10)
    // Columns are eigenvectors: A v = λ v.
    for (c <- 0 to 1) {
      val v = Array(vecs(0)(c), vecs(1)(c))
      val av = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      val lambda = vals(c)
      assert(math.abs(av(0) - lambda * v(0)) < 1e-10)
      assert(math.abs(av(1) - lambda * v(1)) < 1e-10)
    }
  }

  test("fit finds a planted dominant axis; components orthonormal") {
    import spark.implicits._
    // Points t*(0.6, 0.8, 0) + small noise on the other axes, t spread wide.
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val n1 = ((i * 37) % 11 - 5) / 50.0
      val n2 = ((i * 53) % 13 - 6) / 50.0
      (i.toLong, Array(0.6f * t.toFloat + n1.toFloat,
        0.8f * t.toFloat - n2.toFloat, n1.toFloat + n2.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(3)
    val m = Pca.fit(df, "embedding", k = 3)

    assert(m.d == 3 && m.k == 3)
    // Eigenvalues descending, dominant one far ahead.
    assert(m.eigenvalues(0) > m.eigenvalues(1) &&
      m.eigenvalues(1) >= m.eigenvalues(2))
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1))
    // Top component aligns with (0.6, 0.8, 0).
    val align = math.abs(dot(m.components(0), Array(0.6, 0.8, 0.0)))
    assert(align > 0.99, s"alignment $align")
    // Orthonormal.
    for (i <- 0 until 3; j <- i until 3) {
      val g = dot(m.components(i), m.components(j))
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(g - want) < 1e-8, s"gram($i,$j)=$g")
    }
    // Deterministic sign: dominant coordinate positive.
    assert(m.components(0)(m.components(0).map(math.abs).zipWithIndex.maxBy(_._1)._2) > 0)
  }

  test("projection variance matches eigenvalues; centering is exact") {
    import spark.implicits._
    val rows = (0 until 120).map { i =>
      (i.toLong, Array((i % 12).toFloat, ((i * 7) % 5).toFloat, 3.0f))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(4)
    val m = Pca.fit(df, "embedding", k = 2)
    val proj = Pca.project(df, "embedding", m).select("pc0", "pc1")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))

    def popVar(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    val v0 = popVar(proj.map(_._1).toSeq)
    val v1 = popVar(proj.map(_._2).toSeq)
    assert(math.abs(v0 - m.eigenvalues(0)) < 1e-6 * math.max(1, v0))
    assert(math.abs(v1 - m.eigenvalues(1)) < 1e-6 * math.max(1, v1))
    // Centered projections have (near-)zero mean.
    assert(math.abs(proj.map(_._1).sum / proj.length) < 1e-8)
    // The constant third coordinate contributes nothing: projections of a
    // rank-2 dataset onto 2 components preserve total variance.
    val totalVar = Seq(popVar(rows.map(_._2(0).toDouble)),
      popVar(rows.map(_._2(1).toDouble))).sum
    assert(math.abs((v0 + v1) - totalVar) < 1e-6 * totalVar)
  }

  test("CovarianceAgg merges across partitions exactly like a local pass") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    import graft.expr.CovarianceAgg
    val rows = (0 until 57).map(i =>
      (i.toLong, Array(i.toFloat, (i % 7).toFloat)))
    val df = rows.toDF("id", "v").repartition(5)
    val r = df.select(GraftColumnBridge.column(
        CovarianceAgg(GraftColumnBridge.expression(df.col("v")))
          .toAggregateExpression()).as("s"))
      .select("s.n", "s.sums", "s.prods").head()
    assert(r.getLong(0) == 57)
    val xs = rows.map(_._2(0).toDouble)
    val ys = rows.map(_._2(1).toDouble)
    val sums = r.getSeq[Double](1)
    val prods = r.getSeq[Double](2)
    assert(math.abs(sums(0) - xs.sum) < 1e-9)
    assert(math.abs(sums(1) - ys.sum) < 1e-9)
    // Upper triangle (0,0), (0,1), (1,1).
    assert(math.abs(prods(0) - xs.map(x => x * x).sum) < 1e-6)
    assert(math.abs(prods(1) - xs.zip(ys).map { case (a, b) => a * b }.sum) < 1e-6)
    assert(math.abs(prods(2) - ys.map(y => y * y).sum) < 1e-6)
  }

  test("whitening yields unit variance and zero correlation") {
    import spark.implicits._
    // Correlated 2D data: y ≈ 2x + noise.
    val rows = (0 until 300).map { i =>
      val x = (i % 30).toDouble
      val noise = ((i * 17) % 7 - 3).toDouble
      (i.toLong, Array(x.toFloat, (2 * x + noise).toFloat, 1.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 2)
    val w = Pca.whiten(df, "embedding", m).select("wc0", "wc1")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def popVar(xs: Seq[Double]) = {
      val mu = xs.sum / xs.size
      xs.map(v => (v - mu) * (v - mu)).sum / xs.size
    }
    assert(math.abs(popVar(w.map(_._1).toSeq) - 1.0) < 1e-6)
    assert(math.abs(popVar(w.map(_._2).toSeq) - 1.0) < 1e-6)
    // Cross-correlation of distinct whitened components vanishes.
    val cross = w.map { case (a, b) => a * b }.sum / w.length
    assert(math.abs(cross) < 1e-6, s"cross $cross")
  }

  test("property: Jacobi reconstructs random symmetric matrices") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 30) {
      val d = 2 + rnd.nextInt(5)
      val a = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val v = rnd.nextDouble() * 10 - 5
        a(i)(j) = v; a(j)(i) = v
      }
      val (vals, vecs) = Jacobi.symmetricEigen(a)
      // A · V ≈ V · diag(vals), column by column.
      for (c <- 0 until d; r <- 0 until d) {
        val av = (0 until d).map(k => a(r)(k) * vecs(k)(c)).sum
        assert(math.abs(av - vals(c) * vecs(r)(c)) < 1e-8,
          s"d=$d col=$c row=$r")
      }
      // Columns orthonormal.
      for (c1 <- 0 until d; c2 <- c1 until d) {
        val g = (0 until d).map(k => vecs(k)(c1) * vecs(k)(c2)).sum
        assert(math.abs(g - (if (c1 == c2) 1.0 else 0.0)) < 1e-8)
      }
      // Trace preserved: Σλ = tr(A).
      val tr = (0 until d).map(i => a(i)(i)).sum
      assert(math.abs(vals.sum - tr) < 1e-8)
    }
  }

  test("empty input and degenerate k are rejected") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "v")
    intercept[IllegalArgumentException] { Pca.fit(empty, "v", 1) }
    val one = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] { Pca.fit(one, "v", 1) }
    val two = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 1.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] { Pca.fit(two, "v", 3) }
  }
}
