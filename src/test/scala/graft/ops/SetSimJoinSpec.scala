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

  test("sub-shingle docs never appear; empty input yields empty output") {
    val pairs = SetSimJoin.selfJoin(fixture, "doc_id", "text", 3, 0.05)
    val ids = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(6L))
    assert(SetSimJoin.selfJoin(docs(), "doc_id", "text", 3, 0.5).count() === 0)
  }
}
