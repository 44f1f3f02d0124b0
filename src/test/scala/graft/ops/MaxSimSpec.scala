package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaxSimSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def toks(rows: (Long, Int, Array[Double])*): DataFrame =
    rows.toDF("id", "pos", "tv")

  test("MaxSim is the sum over query tokens of the best doc-token cosine") {
    // Query 1: token A = e0, token B = e1.
    val q = toks((1L, 0, Array(1.0, 0.0)), (1L, 1, Array(0.0, 1.0)))
    // Doc 10 matches A exactly and B at cos 0 → 1.0.
    // Doc 20 matches both at 45° → 2·(√2/2) ≈ 1.414214 — ranks FIRST,
    // which is exactly the multi-aspect win a pooled vector loses.
    val d = toks(
      (10L, 0, Array(1.0, 0.0)), (10L, 1, Array(1.0, 0.0)),
      (20L, 0, Array(1.0, 1.0)), (20L, 1, Array(1.0, 1.0)))
    val got = MaxSim.topK(q, d, "id", "pos", "tv", k = 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(2),
        math.rint(r.getDouble(3) * 1e6) / 1e6))
    assert(got.toSeq == Seq((20L, 1, 1.414214), (10L, 2, 1.0)))
  }

  // Clustered multi-vector fixture: 60 docs, 4 tokens each; token t of
  // doc i points along axis (i%6)*4+t with deterministic noise — docs in
  // the same cluster share all four token directions.
  private def corpus(n: Int = 60) = toks((for {
    i <- 0 until n
    t <- 0 until 4
  } yield {
    val axis = (i % 6) * 4 + t
    val v = Array.tabulate(24)(d =>
      (if (d == axis) 3.0 else 0.0) + (((i * 31 + d * 7 + t * 13) % 11) - 5) / 20.0)
    (i.toLong, t, v)
  }): _*)

  test("token-ANN candidate path reranks exactly and recalls the brute top-k") {
    val c = corpus()
    val probes = c.filter(col("id") < 12)
    val brute = MaxSim.topK(probes, c, "id", "pos", "tv", k = 3,
      simPrecision = 6)
    val ann = MaxSim.topKViaAnn(probes, c, "id", "pos", "tv", k = 3,
      tokenK = 32, numPlanes = 2, tables = 6, simPrecision = 6)
    def rows(df: DataFrame) = df.select("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (rows(ann) intersect rows(brute)).size.toDouble /
      rows(brute).size
    assert(recall >= 0.8, s"recall $recall")
    // On candidates both paths score identically: any shared (q,d) pair
    // must carry the same maxsim.
    val joined = ann.select(col("query_id"), col("doc_id"),
        col("maxsim").as("a"))
      .join(brute.select(col("query_id"), col("doc_id"),
        col("maxsim").as("b")), Seq("query_id", "doc_id"))
    assert(joined.filter(col("a") =!= col("b")).isEmpty)
  }

  test("ANN path keeps the self document reachable when probes are drawn " +
    "from the corpus") {
    // Probe i's tokens are IDENTICAL to doc i's — MaxSim(i, i) = 4.0 is
    // the unique maximum, so rank 1 must be the self document for every
    // probe. The struct token key's side tag is what guarantees this:
    // with a shared arithmetic keyspace, lshTopK's query ≠ neighbor
    // self-exclusion silently removed every same-(id, pos) token pair
    // and the true rank-1 could vanish from candidate generation.
    val c = corpus()
    val ann = MaxSim.topKViaAnn(c.filter(col("id") < 12), c,
      "id", "pos", "tv", k = 1, tokenK = 8, numPlanes = 2, tables = 2,
      simPrecision = 6)
    val top1 = ann.filter(col("rank") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.length == 12, top1.toSeq)
    assert(top1.forall { case (q, d) => q == d }, top1.toSeq)
  }

  test("md5-plane ANN variant honors the same candidate/rerank contract") {
    // Same self-document argument as above, through the oracle-parity
    // plane family (q_maxsim_ann gates the full replay; this pins the
    // Scala path on the spec fixture).
    val c = corpus()
    val ann = MaxSim.topKViaAnnMd5(c.filter(col("id") < 8), c,
      "id", "pos", "tv", k = 1, dims = 24, tokenK = 8, numPlanes = 3,
      tables = 2, simPrecision = 6)
    val top1 = ann.filter(col("rank") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top1.length == 8, top1.toSeq)
    assert(top1.forall { case (q, d) => q == d }, top1.toSeq)
  }

  test("token positions past 1024 do not collide across documents") {
    // Doc 0 holds its only token at position 1024; doc 1 at position 0.
    // The retired id*1024+pos packing mapped both to key 1024 and
    // attributed doc 0's token to doc 1; the struct key cannot collide.
    val d = toks((0L, 1024, Array(1.0, 0.0)), (1L, 0, Array(0.0, 1.0)))
    val probe = toks((7L, 0, Array(1.0, 0.0)))
    val got = MaxSim.topKViaAnn(probe, d, "id", "pos", "tv", k = 1,
        tokenK = 4, numPlanes = 2, tables = 4, simPrecision = 6)
      .filter(col("rank") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((7L, 0L)), got)
  }

  test("string document ids flow through both tiers natively") {
    // Ids keep their native type (the struct token key and every join
    // carry idCol as-is) — a long cast here would throw under ANSI or
    // silently empty the candidate set, the FilteredAnn broad-branch
    // failure class.
    val c = corpus(24).select(concat(lit("doc-"),
      col("id").cast("string")).as("id"), col("pos"), col("tv"))
    val probes = c.filter(col("id").isin("doc-0", "doc-1", "doc-2"))
    val brute = MaxSim.topK(probes, c, "id", "pos", "tv", k = 2,
      simPrecision = 6)
    assert(brute.count() == 6)
    val ann = MaxSim.topKViaAnn(probes, c, "id", "pos", "tv", k = 1,
      tokenK = 8, numPlanes = 2, tables = 2, simPrecision = 6)
    val top1 = ann.filter(col("rank") === 1).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(top1.length == 3, top1.toSeq)
    assert(top1.forall { case (q, d) => q == d }, top1.toSeq)
  }

  test("plan: probe bags broadcast; token maxima map-side combined; no global sort") {
    val c = corpus(36)
    val p = c.filter(col("id") < 6)
    val plan = MaxSim.topK(p, c, "id", "pos", "tv", k = 4)
      .queryExecution.executedPlan.toString
    // The probe side broadcasts into the token cross scoring...
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // ...and both grouped aggregations combine map-side before their
    // exchange (per-(q,d,qtoken) max, then the per-(q,d) ordered fold).
    assert(plan.contains("partial_max"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("scores are partitioning-invariant") {
    val c = corpus(36)
    val p = c.filter(col("id") < 6)
    def out(df: DataFrame) = MaxSim.topK(p, df, "id", "pos", "tv", k = 4,
        simPrecision = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(out(c.repartition(17)) == out(c.repartition(1)))
  }
}
