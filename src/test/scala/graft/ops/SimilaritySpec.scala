package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("codegen'd dot/norm/cosine match a scala reference") {
    val a = Seq(1.0f, 2.0f, 3.0f)
    val b = Seq(-1.0f, 0.5f, 2.0f)
    val df = vecs(1L -> a, 2L -> b)
    val crossed = df.select(col("embedding").as("x")).crossJoin(
      df.select(col("embedding").as("y")))
    val got = crossed.select(Similarity.dot(col("x"), col("y"))).collect()
      .map(_.getDouble(0)).sorted
    def refDot(u: Seq[Float], v: Seq[Float]) =
      u.zip(v).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val want = (for (u <- Seq(a, b); v <- Seq(a, b)) yield refDot(u, v)).sorted
    assert(got.toSeq == want)
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val q = Seq(1.0f, 0.0f)
    val corpus = vecs(
      0L -> q,
      1L -> Seq(1.0f, 0.1f), // most similar
      2L -> Seq(1.0f, 0.5f),
      3L -> Seq(0.0f, 1.0f), // orthogonal
      4L -> Seq(1.0f, 0.1f)) // ties with 1 → id order
    val res = Similarity.bruteForceTopK(
      corpus.filter(col("vec_id") === 0), corpus, "vec_id", "embedding", k = 3)
      .collect().sortBy(_.getInt(2)).map(r => (r.getLong(1), r.getInt(2)))
    assert(res.toSeq == Seq((1L, 1), (4L, 2), (2L, 3)))
  }

  test("LSH top-k achieves decent recall against brute force on clustered data") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // 3 clusters of 30 vectors in 16 dims.
    val centers = Seq.fill(3)(Array.fill(16)(rng.nextGaussian()))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield ((ci * 30 + i).toLong,
      c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq)
    val corpus = rows.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 30 === 0)

    val brute = Similarity.bruteForceTopK(probes, corpus, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(probes, corpus, "vec_id", "embedding", 5,
      numPlanes = 6, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("IVF top-k achieves decent recall against brute force on clustered data") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val centers = Seq.fill(3)(Array.fill(16)(rng.nextGaussian()))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield ((ci * 30 + i).toLong,
      c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq)
    val corpus = rows.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 30 === 0)

    val brute = Similarity.bruteForceTopK(probes, corpus, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 90 rows, id % 9 → 10 sampled centroids; probe 3 lists.
    val ivf = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding", 5,
      centroidMod = 9, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")

    // Partition sanity: every corpus row lands in exactly one list, so
    // candidates are never duplicated across probed lists.
    val cand = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding", 90,
      centroidMod = 9, nprobe = 10)
    val dupes = cand.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(dupes == 0)
  }

  test("NULL embeddings are dropped by every entry point") {
    import spark.implicits._
    val df = Seq(
      (0L, Option(Seq(1.0f, 0.0f))),
      (1L, Option(Seq(0.9f, 0.1f))),
      (2L, Option.empty[Seq[Float]])) // NULL vector: never query, never neighbor
      .toDF("vec_id", "embedding")
    val ids = (d: org.apache.spark.sql.DataFrame) =>
      d.select("query_id", "neighbor_id").collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids(Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 5)).contains(2L))
    assert(!ids(Similarity.bruteForceTopKAgg(df, df, "vec_id", "embedding", 5)).contains(2L))
    assert(!ids(Similarity.lshTopK(df, df, "vec_id", "embedding", 5,
      numPlanes = 2, tables = 1)).contains(2L))
    assert(!ids(Similarity.ivfTopK(df, df, "vec_id", "embedding", 5,
      centroidMod = 1, nprobe = 2)).contains(2L))
    val pairIds = graft.ops.Dedup
      .embeddingNearDupBrute(df, "vec_id", "embedding", -1.0)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!pairIds.contains(2L))
  }

  test("ivfTopK empty codebook fails at execution, constructs without a job") {
    import spark.implicits._
    // Ids 1..9 with centroidMod 100 sample no centroids.
    val df = (1 to 9).map(i => (i.toLong, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val sc = spark.sparkContext
    val jobsBefore = sc.statusTracker.getJobIdsForGroup(null).length
    val lazyResult = Similarity.ivfTopK(df, df, "vec_id", "embedding", 3,
      centroidMod = 100, nprobe = 2)
    // Constructing the operator must not have launched a Spark job (the
    // old guard ran an eager isEmpty action here).
    assert(sc.statusTracker.getJobIdsForGroup(null).length == jobsBefore)
    val e = intercept[Exception] { lazyResult.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("sampled no centroids")), e.getMessage)
  }

  test("empty and all-null-element vectors bucket to 0, like NULL list_sum") {
    import spark.implicits._
    // DuckDB's list_sum over an empty/all-NULL list is NULL, so `pr >= 0`
    // sets no bit there; the expressions must agree (ADVICE r04).
    val df = Seq(
      (0L, Seq[Option[Float]](Some(1.0f), Some(2.0f))),
      (1L, Seq[Option[Float]]()),
      (2L, Seq[Option[Float]](None, None)))
      .toDF("vec_id", "embedding")
    val planes = Array.tabulate(4)(p => Similarity.md5PlaneComponents(p, 2))
    val got = df.select(col("vec_id"),
        graft.expr.VectorExprs.lshBucket(col("embedding"), 4).as("xx"),
        graft.expr.VectorExprs.planeBuckets(col("embedding"), planes).as("md5"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((0L, 0L)))
    assert(got(0L)._1 != 0L || got(0L)._2 != 0L) // real vector still buckets
  }

  test("int8 quantization: codes in range, reconstruction within half a step") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 50L).map(i =>
      (i, Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding")).as("q"))
      .select(col("vec_id"), col("q.scale"), col("q.codes"))
      .as[(Long, Float, Seq[Int])].collect()
    val byId = vecs.toMap
    got.foreach { case (id, scale, codes) =>
      val orig = byId(id)
      assert(scale == orig.map(math.abs).max)
      assert(codes.forall(c => c >= -127 && c <= 127))
      codes.zip(orig).foreach { case (c, x) =>
        val rec = c * scale.toDouble / 127.0
        assert(math.abs(rec - x) <= scale / 254.0 + 1e-9,
          s"vec $id: $x -> $c -> $rec")
      }
      // The max-|x| component saturates at ±127 exactly.
      val iMax = orig.indices.maxBy(i => math.abs(orig(i)))
      assert(math.abs(codes(iMax)) == 127)
    }
  }

  test("quantized dot approximates the exact dot; zero vector quantizes clean") {
    import spark.implicits._
    val a = Array(0.5f, -1.0f, 0.25f, 2.0f)
    val b = Array(1.5f, 0.5f, -0.75f, 0.1f)
    val df = Seq((a, b)).toDF("a", "b")
    val (qdot, exact) = df.select(
        Similarity.dotQuantized(Similarity.quantizeInt8(col("a")),
          Similarity.quantizeInt8(col("b"))),
        Similarity.dot(col("a"), col("b")))
      .as[(Double, Double)].head()
    // 16 components max error scale/254 each → generous bound.
    assert(math.abs(qdot - exact) < 0.05, s"$qdot vs $exact")
    val z = Seq(Tuple1(Array(0f, 0f))).toDF("v")
      .select(Similarity.quantizeInt8(col("v")).as("q"))
      .select(col("q.scale"), col("q.codes")).as[(Float, Seq[Int])].head()
    assert(z == ((0f, Seq(0, 0))))
  }

  test("multi-probe LSH candidates strictly contain the single-probe set") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val centers = Seq.fill(3)(Array.fill(16)(rng.nextGaussian()))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield ((ci * 30 + i).toLong,
      c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq)
    val corpus = rows.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 30 === 0)

    def pairs(flips: Int) = Similarity.lshTopKMultiProbe(
      probes, corpus, "vec_id", "embedding", k = 90,
      numPlanes = 6, tables = 1, flips = flips)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(0)
    val multi = pairs(6)
    assert(single.subsetOf(multi))

    val brute = Similarity.bruteForceTopK(probes, corpus, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mpTop = Similarity.lshTopKMultiProbe(
      probes, corpus, "vec_id", "embedding", k = 5,
      numPlanes = 6, tables = 1, flips = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(mpTop).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("IVF over a k-means codebook: learned cells recall >= sampled cells") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val centers = Seq.fill(4)(Array.fill(16)(rng.nextGaussian()))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      i <- 0 until 30
    } yield ((ci * 30 + i).toLong,
      c.map(x => (x + rng.nextGaussian() * 0.1).toFloat).toSeq)
    val corpus = rows.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 30 === 0)

    val brute = Similarity.bruteForceTopK(probes, corpus, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = graft.ml.KMeans.fit(corpus, "vec_id", "embedding", k = 4, iterations = 3)
    val learned = Similarity.ivfTopKWith(probes, corpus, "vec_id", "embedding", 5,
      graft.ml.KMeans.centroidFrame(corpus, model), nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(learned).size.toDouble / brute.size
    // 4 learned cells over 4 planted blobs at nprobe=2 should be near-exact.
    assert(recall >= 0.9, s"recall=$recall")
    // No cross-list duplicate candidates with a learned codebook either.
    val dupes = Similarity.ivfTopKWith(probes, corpus, "vec_id", "embedding", 120,
      graft.ml.KMeans.centroidFrame(corpus, model), nprobe = 4)
      .groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(dupes == 0)
  }
}
