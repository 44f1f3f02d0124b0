package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkTestBase {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(3)
  }

  private val eval = df(Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs"))

  test("planted eval n-grams are flagged with distinct-hit counts") {
    val train = df(Seq(
      // contains "the quick brown" and "quick brown fox" (2 distinct hits)
      10L -> "watch the quick brown fox run",
      // the same eval trigram TWICE — still ONE distinct hit
      11L -> "pack my box again and pack my box",
      // word overlap but no shared trigram
      12L -> "the brown dog jumps quick",
      13L -> "completely unrelated text here"))
    val got = Decontaminate
      .flagContaminated(train, eval, "doc_id", "text", n = 3)
      .select("doc_id", "n_eval_ngrams", "contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got == Set(
      (10L, 2L, true), (11L, 1L, true), (12L, 0L, false), (13L, 0L, false)))
  }

  test("bloom prefilter changes nothing about the result") {
    val rng = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d", "e", "f", "g")
    val train = df((1L to 200L).map(i =>
      i -> Seq.fill(12)(words(rng.nextInt(words.size))).mkString(" ")))
    val ev = df((900L to 905L).map(i =>
      i -> Seq.fill(12)(words(rng.nextInt(words.size))).mkString(" ")))
    def run(bloom: Boolean) = Decontaminate
      .flagContaminated(train, ev, "doc_id", "text", n = 4,
        bloomPrefilter = bloom, estEvalNgrams = 64)
      .select("doc_id", "n_eval_ngrams")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(bloom = true) == run(bloom = false))
  }

  test("bloomFilterRows: superset of the exact semi-join; empty filter side is empty") {
    import spark.implicits._
    val rows = (1 to 500).map(i => s"k$i").toDF("k").repartition(4)
    val keys = (1 to 50).map(i => s"k${i * 7}").toDF("k")
    val exact = rows.join(keys, Seq("k"), "left_semi")
      .collect().map(_.getString(0)).toSet
    val pre = Decontaminate.bloomFilterRows(rows, keys, col("k"), 50)
      .collect().map(_.getString(0)).toSet
    assert(exact.subsetOf(pre), "bloom must have no false negatives")
    assert(Decontaminate.bloomFilterRows(rows, keys.limit(0), col("k"), 50)
      .isEmpty, "empty filter side prunes everything")
  }

  test("flagFuzzy: verbatim eval copy flagged at jaccard 1.0, clean and " +
      "too-short docs land as clean rows") {
    val train = df(Seq(
      10L -> "the quick brown fox jumps over the lazy dog", // = eval doc 1
      11L -> "zeta omega kappa lambda sigma tau phi psi",   // disjoint vocab
      12L -> "two words"))                                  // no 3-shingles
    val got = Decontaminate
      .flagFuzzy(train, eval, "doc_id", "text", minJaccard = 0.5)
      .select("doc_id", "n_eval_neardups", "max_jaccard", "fuzzy_contaminated")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(
      (10L, 1L, 1.0, true), (11L, 0L, 0.0, false), (12L, 0L, 0.0, false)))
  }

  test("flagFuzzy: threshold rollup agrees with the raw candidate pairs") {
    val rng = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e")
    val train = df((1L to 60L).map(i =>
      i -> Seq.fill(9)(words(rng.nextInt(words.size))).mkString(" ")))
    val ev = df((900L to 909L).map(i =>
      i -> Seq.fill(9)(words(rng.nextInt(words.size))).mkString(" ")))
    val expected = Dedup
      .md5MinHashCandidatesAgainst(batch = ev, corpus = train,
        "doc_id", "text", shingleSize = 3, numHashes = 16, bands = 8)
      .filter(col("jaccard_est") >= 0.5)
      .groupBy("id_corpus").agg(
        count(lit(1)).as("n"), max("jaccard_est").as("mj"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = Decontaminate
      .flagFuzzy(train, ev, "doc_id", "text", minJaccard = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.length == 60, "every train doc must appear exactly once")
    got.foreach { case (id, n, mj, flag) =>
      val (en, emj) = expected.getOrElse(id, (0L, 0.0))
      assert((n, mj, flag) == ((en, emj, en > 0)), s"doc $id")
    }
  }
}
