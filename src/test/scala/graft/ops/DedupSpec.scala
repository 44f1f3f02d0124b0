package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-duplicate tests for the near-dup family (the xxhash64-based ops
  * that have no DuckDB oracle).
  */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest tonight while everyone sleeps"

  test("minhash LSH surfaces planted near-duplicates with high estimates") {
    val corpus = docs(
      1L -> base,
      2L -> (base + " extra"), // near-dup of 1
      3L -> base.replace("quick", "slow"), // near-dup of 1
      4L -> "completely unrelated words about spark catalyst optimizer internals and plans",
      5L -> "another doc sharing no shingles with anything else at all here today")
    val cand = Dedup.minHashCandidates(corpus, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cand.contains((1L, 2L)), s"got $cand")
    assert(cand((1L, 2L)) > 0.5)
    assert(!cand.keySet.exists { case (a, b) => Set(a, b).contains(4L) && Set(a, b).contains(5L) })
  }

  test("minhash estimate approximates exact jaccard on planted pairs") {
    val corpus = docs(1L -> base, 2L -> (base + " extra words here"))
    val exact = Dedup.ngramJaccardSparse(corpus, "doc_id", "text", 3)
      .collect().head.getDouble(2)
    val est = Dedup.minHashCandidates(corpus, "doc_id", "text", 3, 64, 16)
      .collect().head.getDouble(2)
    assert(math.abs(exact - est) < 0.25, s"exact=$exact est=$est")
  }

  test("sparse jaccard equals the array-intersect form") {
    import spark.implicits._
    val corpus = docs(
      1L -> base, 2L -> (base + " extra"), 3L -> base.replace("quick", "slow"),
      4L -> "some partially shared words about the quick brown fox here")
    val pairs = corpus.select(col("doc_id").as("id_a"))
      .crossJoin(corpus.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val dense = Dedup.ngramJaccard(pairs, corpus, "doc_id", "text", 3)
      .filter(col("jaccard") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sparse = Dedup.ngramJaccardSparse(corpus, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    // sparse emits (id_a < id_b) as (col order id_b first after joins) —
    // normalize both to the same key orientation before comparing.
    val sparseNorm = sparse.map { case ((b, a), v) => (math.min(a, b), math.max(a, b)) -> v }
    val denseNorm = dense.map { case ((a, b), v) => (math.min(a, b), math.max(a, b)) -> v }
    assert(sparseNorm == denseNorm)
  }

  test("simhash of near-identical docs differs in few bits") {
    import spark.implicits._
    val out = docs(1L -> base, 2L -> (base + " extra"), 3L -> "totally different content matrix")
      .select(col("doc_id"), Dedup.simHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(out(1L), out(2L)) < hamming(out(1L), out(3L)))
  }

  test("exactByDigest keeps the min id per normalized content") {
    import spark.implicits._
    val corpus = docs(5L -> "Hello  World", 2L -> "hello world", 9L -> "other text")
    val survivors = Dedup.exactByDigest(corpus, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(2L, 9L))
  }

  test("connectedComponents matches union-find on random graphs") {
    import spark.implicits._
    (1 to 5).foreach { round =>
      val rng = new scala.util.Random(round * 101 + 3)
      val n = 40 + rng.nextInt(60)
      val edges = Seq.fill(n)((rng.nextInt(50).toLong, rng.nextInt(50).toLong))
        .filter { case (a, b) => a != b }

      // Driver-side union-find ground truth (min-id representative).
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = parent.keys.map(k => k -> find(k)).toMap

      // Both execution paths must agree with ground truth: the pure
      // distributed star rounds (localFinishEdges = 0) and the default
      // local-finish union-find task.
      for (threshold <- Seq(0L, 4L << 20)) {
        val got = Dedup.connectedComponents(
          edges.toDF("a", "b").repartition(4), "a", "b",
          localFinishEdges = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"round $round (threshold $threshold): $edges")
      }
    }
  }

  test("connectedComponents handles a long path graph (worst case for rounds)") {
    import spark.implicits._
    // Path 0-1-2-…-199: diameter 199 forces many label hops — the
    // large-star/small-star pair must still converge in O(log²) rounds.
    // localFinishEdges = 0 forces the distributed rounds all the way to
    // the star-forest fixpoint (the default would finish this locally).
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b", localFinishEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("connectedComponents local finish engages mid-contraction") {
    import spark.implicits._
    // Dense band graph: 60 nodes, edges (i, j) for j-i ≤ 5 → 285 canonical
    // edges that contract to ≤ ~120 (one parent edge per non-root) after a
    // round. Threshold 200 sits between: the run MUST start distributed and
    // cross into the union-find task, still labeling everything 0.
    val edges = (for {
      i <- 0L until 60L; d <- 1L to 5L if i + d < 60L
    } yield (i, i + d)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b", localFinishEdges = 200L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("connectedComponents guards run on POST-cast ids") {
    import spark.implicits._
    // "1"/"01" collapse to the same node under the cast → self-loop, gone;
    // an uncastable endpoint nulls out → edge dropped, not poisoned.
    val edges = Seq(("1", "01"), ("2", "3"), ("4", "not_a_number")).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L, 3L -> 2L))
  }

  test("connectedComponents on an empty edge set returns no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty, "a", "b").count() == 0)
  }

  test("two-sided LSH finds batch↔corpus near-dups and never self-pairs") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again " * 3
    val corpus = Seq(
      (1L, text), (2L, text + " tail"), // near-dups of each other AND of 100
      (3L, "completely different words about spark shuffles and joins")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, text + " extra"),          // near-dup of corpus 1/2
      (101L, "nothing like anything at all in this corpus honestly")
    ).toDF("doc_id", "text")
    val got = Dedup.md5MinHashCandidatesAgainst(batch, corpus, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bands = 8)
      .as[(Long, Long, Double)].collect()
    assert(got.forall { case (a, b, _) => a >= 100L && b < 100L })
    val hit = got.filter(_._1 == 100L).map(p => p._2 -> p._3).toMap
    assert(hit.contains(1L) && hit(1L) > 0.5)
    // corpus 1–2 near-dup pair must NOT appear (that's the self-join's job)
    assert(!got.exists { case (a, b, _) => a < 100L || b >= 100L })
  }

  test("dupNgramFraction: planted shared trigram, short docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),     // grams: abg, bgd — abg shared
      (2L, "alpha beta gamma epsilon"),   // abg shared, bge unique
      (3L, "zeta eta theta iota"),        // all unique
      (4L, "too short")                   // < 3 tokens → no grams
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramFraction(docs, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "n_dup_grams", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 0L, 0.0))))
  }

  test("dupNgramFraction counts DISTINCT grams (repetition insensitive)") {
    import spark.implicits._
    // "x y x y x y": distinct bigrams {x y, y x} — repetition in one doc
    // does not inflate its own df.
    val docs = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val got = Dedup.dupNgramFraction(docs, "doc_id", "text", 2)
      .select("n_grams", "n_dup_grams").as[(Long, Long)].head()
    assert(got == ((2L, 0L)))
  }

  test("clusterRepresentatives keeps the best copy; singletons keep themselves") {
    import spark.implicits._
    val docs = Seq(
      (1L, 100L), (2L, 300L), (3L, 300L), // cluster {1,2,3}: 3 wins the tie
      (4L, 50L),                          // singleton
      (5L, 10L), (6L, 5L)                 // cluster {5,6}: 5 wins
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.clusterRepresentatives(docs, "doc_id", "quality",
      pairs, "id_a", "id_b")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((1L, false)), 2L -> ((1L, false)), 3L -> ((1L, true)),
      4L -> ((4L, true)),
      5L -> ((5L, true)), 6L -> ((5L, false))))
  }

  test("clusterRepresentatives with no pairs keeps everything") {
    import spark.implicits._
    val docs = Seq((1L, 9L), (2L, 8L)).toDF("doc_id", "quality")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.clusterRepresentatives(docs, "doc_id", "quality",
      none, "id_a", "id_b").as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true)))
  }
}
