package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SetSimJoinSpec extends AnyFunSuite with SparkTestBase {

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Naive exact Jaccard over distinct 3-shingle sets via cross join. */
  private def naive(d: DataFrame, tau: Double): Set[(Long, Long, Double)] = {
    val sets = d.select(col("doc_id"),
        graft.expr.WordShingles.shingles(col("text"), 3, distinct = true)
          .as("s"))
      .filter(size(col("s")) > 0)
    val a = sets.select(col("doc_id").as("id_a"), col("s").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("j"))
      .filter(col("j") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def fixture = docs(
    1L -> base,
    2L -> (base + " extra trailing words"),             // near-dup of 1
    3L -> base.replace("delta", "changed"),             // near-dup of 1
    4L -> "completely different content about spark catalyst rules and strategies today",
    5L -> "another unrelated doc discussing parquet row groups and page headers",
    6L -> "tiny",                                       // no 3-shingles
    7L -> "completely different content about spark catalyst rules and strategies today")

  test("selfJoin equals the naive all-pairs computation at several taus") {
    for (tau <- Seq(0.1, 0.3, 0.5, 0.9)) {
      val got = SetSimJoin.selfJoin(fixture, "doc_id", "text", 3, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === naive(fixture, tau), s"tau=$tau")
    }
  }

  test("identical docs pair at jaccard 1.0; exact value is a plain ratio") {
    val got = SetSimJoin.selfJoin(fixture, "doc_id", "text", 3, 0.99)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got === Map((4L, 7L) -> 1.0))
  }

  test("prefix filter prunes candidates on diverse corpora") {
    val ranked = SetSimJoin.rankedSets(fixture, "doc_id", "text", 3)
    val nDocs = ranked.count()
    val cands = SetSimJoin.candidatePairs(ranked, 0.5).count()
    assert(cands < nDocs * (nDocs - 1) / 2,
      s"no pruning: $cands candidates from $nDocs docs")
  }

  test("candidates are a superset of the verified result") {
    val ranked = SetSimJoin.rankedSets(fixture, "doc_id", "text", 3)
    val cands = SetSimJoin.candidatePairs(ranked, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val result = SetSimJoin.selfJoin(fixture, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(result.subsetOf(cands))
  }

  test("small-vocabulary corpus: parity with naive, and the accumulated " +
      "positional filter prunes strictly below the first-token bound") {
    // The bench corpus's pathology: ~40-word vocabulary, so shingle sets
    // overlap heavily and long SHARED prefixes are the norm — exactly
    // where the accumulated bound (cp + tail past the LAST common prefix
    // token) bites and the first-token bound does not. Deterministic
    // LCG-built docs, 60 docs of 25 words over a 12-word vocab.
    val vocab = Array("ore", "bar", "gem", "rune", "log", "bone", "herb", "seed")
    var s = 12345L
    def nxt(): Int = { s = (s * 6364136223846793005L + 1442695040888963407L); ((s >>> 33) % vocab.length).toInt }
    val corpus = docs((1L to 60L).map { id =>
      id -> (1 to 30).map(_ => vocab(nxt())).mkString(" ")
    }: _*)
    for (tau <- Seq(0.3, 0.6)) {
      val got = SetSimJoin.selfJoin(corpus, "doc_id", "text", 3, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === naive(corpus, tau), s"tau=$tau")
    }
    // First-token-only candidate count, computed the way candidatePairs
    // did before the accumulated refinement — the new filter must emit a
    // (weak) subset, and on this corpus a strictly smaller one.
    val tau = 0.4
    val ranked = SetSimJoin.rankedSets(corpus, "doc_id", "text", 3)
    val prefix = ranked.select(col("id"), col("sz"),
      posexplode(slice(col("grams"), lit(1),
        (col("sz") - ceil(col("sz") * lit(tau) - lit(1e-9)) + lit(1)).cast("int")))
        .as(Seq("pos", "gram")))
    val a = prefix.select(col("id").as("id_a"), col("sz").as("sz_a"),
      col("pos").as("__pa"), col("gram"))
    val b = prefix.select(col("id").as("id_b"), col("sz").as("sz_b"),
      col("pos").as("__pb"), col("gram"))
    val firstTokenOnly = a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")) >=
          ceil(greatest(col("sz_a"), col("sz_b")) * lit(tau) - lit(1e-9)))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(min(col("__pa")).as("__pa"), min(col("__pb")).as("__pb"))
      .filter(
        least(col("sz_a") - col("__pa"), col("sz_b") - col("__pb"))
          .cast("double") >=
          (col("sz_a") + col("sz_b")) * lit(tau / (1.0 + tau)) - lit(1e-9))
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val accumulated = SetSimJoin.candidatePairs(ranked, tau)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = naive(corpus, tau).map(t => (t._1, t._2))
    assert(accumulated.subsetOf(firstTokenOnly))
    assert(truth.subsetOf(accumulated))
    assert(accumulated.size < firstTokenOnly.size,
      s"accumulated=${accumulated.size} firstToken=${firstTokenOnly.size}")
  }

  test("sub-shingle docs never appear; empty input yields empty output") {
    val pairs = SetSimJoin.selfJoin(fixture, "doc_id", "text", 3, 0.05)
    val ids = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(6L))
    assert(SetSimJoin.selfJoin(docs(), "doc_id", "text", 3, 0.5).count() === 0)
  }
}
