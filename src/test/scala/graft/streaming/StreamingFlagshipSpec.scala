package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import graft.ops.{GraphIndex, IvfIndex, MaxSim, MaxSimIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming FLAGSHIP: one MemoryStream feeds the composed curation
  * chain ([[StreamingCuration]]: exact dedup → near-dup → quality →
  * as-of enrich), and every batch's enriched SURVIVORS fan into all
  * FOUR serving-index maintenance sinks — IVF, kNN graph, ColBERT
  * token index, IVF-PQ — then retrieval reads back through the
  * maintained artifacts. Continuous corpus curation and serving-index freshness
  * from the same stream, with the crash/replay cases exercised
  * END-TO-END rather than per sink:
  *
  *   - a replayed batchId is a curation no-op: the sink (and therefore
  *     every index) is untouched;
  *   - a crash BETWEEN sink and corpus commit replays byte-identical
  *     survivors into the sinks: each maintenance writer must converge,
  *     not duplicate (graph: no new generation; IVF: touched-list
  *     anti-join; token index: row-level guard);
  *   - a TORN token append from a previous attempt is healed by the
  *     real delivery (the row-level guard appends exactly the missing
  *     rows);
  *   - the token index starts from the EMPTY-bootstrap write (no data
  *     files until the first survivor batch).
  *
  * Read-back truth: the curated corpus store is the ground truth the
  * indexes must agree with — graph edges equal brute top-k over
  * seeds ∪ survivors (unambiguous cluster fixture), IVF probes equal a
  * from-scratch build over the same rows and codebook, token-index
  * probes equal the inline ANN scorer over the survivors' tokens.
  */
class StreamingFlagshipSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // The StreamingCurationSpec text fixture (guarded there: near-dups
  // clear tau=0.4 under the md5 MinHash family, junk fails quality 0.7).
  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seventeen startled geese assemble near the frozen river bank at dawn " +
    "watching every careless step with growing suspicion and mild disdain"
  private val nearDupA = base.replace("growing", "mounting")
  private val unrelated = "completely different subject matter entirely " +
    "concerning the quarterly financial performance of an obscure regional " +
    "railway operator and its perpetually delayed infrastructure upgrades"
  private val fresh = "the field biologists tally nesting burrows of " +
    "migratory puffin colonies along basalt cliffs each brief subarctic " +
    "summer and compare their counts against the previous decade of records"
  private val freshB = "municipal archivists catalogue the brittle glass " +
    "plate negatives recovered from a shuttered portrait studio and argue " +
    "gently about the correct humidity for their long term storage vault"
  private val junk = "BUY NOW!!!"

  // 12-dim cluster embeddings (4 one-hot axes + deterministic noise);
  // tokens = 3 slices of 4 dims for the late-interaction index.
  private def vec(i: Long): Array[Double] = {
    val c = (i % 4).toInt
    Array.tabulate(12)(d =>
      (if (d == 3 * c) 4.0 else 0.0) + (((i * 31 + d * 7) % 11) - 5) / 40.0)
  }

  private def toksOf(ids: Seq[Long]): DataFrame =
    (for { i <- ids; p <- 0 until 3 }
      yield (i, p, vec(i).slice(4 * p, 4 * p + 4)))
      .toDF("doc_id", "pos", "tv")

  private def tokensFromBatch(df: DataFrame): DataFrame =
    df.select(col("doc_id"), posexplode(array((0 until 3).map(p =>
      slice(col("embedding"), 4 * p + 1, 4)): _*)).as(Seq("pos", "tv")))

  private def build(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Seq(("u1", t("2024-01-01 09:00:00"), 100L),
      ("u2", t("2024-01-01 09:30:00"), 200L))
      .toDF("user", "price_ts", "price")
  }

  test("curation survivors maintain all three indexes; replays, " +
    "sink-redelivery and torn appends all converge end-to-end") {
    val root = Files.createTempDirectory("graft_flag").toString
    val cur = new StreamingCuration(s"$root/corpus", idCol = "doc_id",
      textCol = "text", tsCol = "ts", minQuality = 0.7, tau = 0.4)
    val ivfPath = s"$root/ivf"
    val gPath = s"$root/graph"
    val msPath = s"$root/tokens"
    val K = 3

    // Indexes exist before the stream: IVF + graph seeded with four
    // out-of-stream docs (100..103 — one per cluster); the token index
    // starts from the EMPTY-bootstrap write.
    val seeds = (100L to 103L).map(i => (i, vec(i)))
      .toDF("doc_id", "embedding")
    val cent = (0 until 4).map(c =>
        (c.toLong, Array.tabulate(12)(d => if (d == 3 * c) 1.0 else 0.0)))
      .toDF("centroid_id", "centroid")
    IvfIndex.write(ivfPath, seeds, "doc_id", "embedding", cent)
    GraphIndex.write(spark, gPath, seeds, "doc_id", "embedding",
      k = K, rounds = 4, simPrecision = 6)
    MaxSimIndex.write(spark, msPath,
      Seq.empty[(Long, Int, Array[Double])].toDF("doc_id", "pos", "tv"),
      "doc_id", "pos", "tv", dims = 4, numPlanes = 3, tables = 2)
    // Fourth family: the IVF-PQ serving index, codebooks fit ONCE on
    // the seeds and frozen — maintenance appends/updates encode under
    // them, so scratch builds with the same (cent, model) are the
    // exact read-back expectation at every stage.
    val pqPath = s"$root/pq"
    val pqModel = graft.ml.Pq.fit(seeds, "doc_id", "embedding",
      dims = 12, m = 3, k = 2, iterations = 2)
    graft.ops.PqIndex.write(spark, pqPath, seeds, "doc_id", "embedding",
      cent, pqModel)

    // The flagship sink: the curation delivery (enriched survivors
    // tagged 'add' + the batch's CDC delete ids tagged 'delete', ONE
    // frame) fans into all three maintenance writers' op-aware paths
    // (the foreachBatch bodies the streaming sinks wire — invoked here
    // exactly as the curation contract delivers).
    val ivfW = StreamingIvfMaintenance.writer(ivfPath, "doc_id",
      "embedding", opCol = "op")
    val graphW = StreamingGraphMaintenance.writer(gPath, "doc_id",
      "embedding", k = K, rounds = 4, simPrecision = 6,
      opCol = Some("op"))
    val msW = StreamingMaxSimMaintenance.writer(msPath, "doc_id", "pos",
      "tv", opCol = Some("op"))
    val pqW = StreamingPqMaintenance.writer(pqPath, "doc_id",
      "embedding", "op")
    val sink = (df: DataFrame, id: Long) => {
      val tagged = df.select(col("doc_id"), col("embedding"), col("op"))
        .localCheckpoint(true)
      ivfW(tagged, id)
      graphW(tagged, id)
      pqW(tagged, id)
      val addToks = tokensFromBatch(
          tagged.filter(col("op") === "add").drop("op"))
        .withColumn("op", lit("add"))
      val delToks = tagged.filter(col("op") === "delete")
        .select(col("doc_id"), lit(null).cast("int").as("pos"),
          lit(null).cast("array<double>").as("tv"), col("op"))
      msW(addToks.unionByName(delToks), id)
      ()
    }

    val mem = MemoryStream[(Long, String, String, Timestamp, Array[Double], String)](spark)
    val docs = mem.toDF().toDF("doc_id", "user", "text", "ts", "embedding",
      "op")
    val ckpt = Files.createTempDirectory("graft_flag_ckpt").toString
    def start() = cur.writer(docs, build, Seq("user"), "price_ts",
      Seq("price"), opCol = Some("op"))(sink)
      .option("checkpointLocation", ckpt).start()

    // Batch A: two keepers, junk, an exact dup. Batch B (after restart):
    // a cross-batch near-dup (dropped) and a fresh keeper — but first,
    // simulate a TORN append of batch B's survivor from a crashed
    // earlier attempt: only one of doc 6's three token rows landed.
    mem.addData(
      (1L, "u1", base, t("2024-01-01 10:00:00"), vec(1L), "add"),
      (2L, "u1", junk, t("2024-01-01 10:00:01"), vec(2L), "add"),
      (3L, "u2", unrelated, t("2024-01-01 10:00:02"), vec(3L), "add"),
      (4L, "u2", base, t("2024-01-01 10:00:03"), vec(4L), "add"))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    MaxSimIndex.append(spark, msPath,
      toksOf(Seq(6L)).filter(col("pos") === 0), "doc_id", "pos", "tv")

    mem.addData(
      (5L, "u1", nearDupA, t("2024-01-01 10:10:00"), vec(5L), "add"),
      (6L, "u1", fresh, t("2024-01-01 10:10:05"), vec(6L), "add"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    // Curated corpus: exactly the keepers.
    val kept = cur.corpus(spark).get.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 6L), kept.toString)

    val indexed = (Seq(1L, 3L, 6L) ++ (100L to 103L)).sorted
    val corpusAll = indexed.map(i => (i, vec(i)))
      .toDF("doc_id", "embedding")

    // Graph read-back: maintained edges == brute top-k over
    // seeds ∪ survivors (every batch stitched, nothing else).
    def edgeSet() = GraphIndex.edges(spark, gPath).select("id", "nbr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(corpusAll, corpusAll,
        "doc_id", "embedding", k = K)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet() == brute,
      s"missing=${(brute -- edgeSet()).take(5)} extra=${(edgeSet() -- brute).take(5)}")

    // IVF read-back: probes equal a from-scratch build over the same
    // rows and codebook.
    val scratch = s"$root/ivf_scratch"
    IvfIndex.write(scratch, corpusAll, "doc_id", "embedding", cent)
    def probeIvf(p: String) = IvfIndex.topK(spark, p, corpusAll,
        "doc_id", "embedding", k = K, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probeIvf(ivfPath) == probeIvf(scratch))

    // IVF-PQ read-back: probes equal a scratch build over the same rows
    // under the SAME frozen codebooks.
    def probePq(p: String, probes: DataFrame) =
      graft.ops.PqIndex.topK(spark, p, probes, "doc_id", "embedding",
          k = K, candidateK = 6, nprobe = 2)
        .select("query_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def pqScratch(rows: DataFrame, tag: String): String = {
      val p = s"$root/pq_scratch_$tag"
      graft.ops.PqIndex.write(spark, p, rows, "doc_id", "embedding",
        cent, pqModel)
      p
    }
    assert(probePq(pqPath, corpusAll) ==
      probePq(pqScratch(corpusAll, "all"), corpusAll))

    // Token-index read-back (torn append healed, bootstrap filled):
    // probes equal the inline ANN scorer over the survivors' tokens.
    val probes = toksOf(Seq(1L, 6L))
    def canon(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2),
        math.rint(r.getDouble(3) * 1e6) / 1e6)).toSet
    val gotMs = canon(MaxSimIndex.topK(spark, msPath, probes,
      "doc_id", "pos", "tv", k = K, tokenK = 4, simPrecision = 6))
    val wantMs = canon(MaxSim.topKViaAnnMd5(probes, toksOf(Seq(1L, 3L, 6L)),
      "doc_id", "pos", "tv", k = K, dims = 4, tokenK = 4, numPlanes = 3,
      tables = 2, simPrecision = 6))
    assert(gotMs == wantMs && gotMs.nonEmpty)

    // Replayed batchId: curation refuses it, sinks never fire, every
    // index byte-unchanged.
    val gv = GraphIndex.liveVersion(spark, gPath)
    val msRows = spark.read.parquet(
      s"$msPath/${MaxSimIndex.liveVersion(spark, msPath)}/toks").count()
    val batchA = Seq(
      (1L, "u1", base, t("2024-01-01 10:00:00"), vec(1L), "add"),
      (3L, "u2", unrelated, t("2024-01-01 10:00:02"), vec(3L), "add"))
      .toDF("doc_id", "user", "text", "ts", "embedding", "op")
    cur.processBatch(batchA, 0L, build(spark), Seq("user"), "price_ts",
      Seq("price"), opCol = Some("op"))(sink)
    assert(GraphIndex.liveVersion(spark, gPath) == gv)
    assert(spark.read.parquet(
      s"$msPath/${MaxSimIndex.liveVersion(spark, msPath)}/toks").count()
      == msRows)

    // Crash between sink and corpus commit: the replay re-invokes the
    // SINK with byte-identical survivors — every maintenance writer
    // must converge, not duplicate.
    val survivorsB = corpusAll.filter(col("doc_id") === 6L)
      .withColumn("op", lit("add"))
    sink(survivorsB, 1L)
    assert(GraphIndex.liveVersion(spark, gPath) == gv,
      "redelivered sink wrote a graph generation")
    assert(edgeSet() == brute)
    assert(probeIvf(ivfPath) == probeIvf(scratch))
    assert(canon(MaxSimIndex.topK(spark, msPath, probes,
      "doc_id", "pos", "tv", k = K, tokenK = 4, simPrecision = 6)) == wantMs)

    // ------------------------------------------------ delete CDC leg
    // Batch C: a CDC delete for curated doc 1 plus a fresh keeper, in
    // ONE batch — the doc must vanish from the corpus AND all three
    // maintained indexes' read-backs, while the add stitches in
    // alongside it.
    mem.addData(
      (1L, "u1", "", t("2024-01-01 10:20:00"),
        null.asInstanceOf[Array[Double]], "delete"),
      (7L, "u2", freshB, t("2024-01-01 10:20:05"), vec(7L), "add"))
    val q3 = start()
    q3.processAllAvailable(); q3.stop()

    assert(cur.corpus(spark).get.select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(3L, 6L, 7L))

    val surv = (Seq(3L, 6L, 7L) ++ (100L to 103L)).sorted
    val corpusSurv = surv.map(i => (i, vec(i)))
      .toDF("doc_id", "embedding")
    // Graph: the delete tombstones FIRST, then the batch's add folds +
    // repairs — the maintained graph must equal brute top-k over the
    // survivors (doc 1 neither returned nor routed through).
    val bruteSurv = Similarity.bruteForceTopK(corpusSurv, corpusSurv,
        "doc_id", "embedding", k = K)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet() == bruteSurv,
      s"missing=${(bruteSurv -- edgeSet()).take(5)} extra=${(edgeSet() -- bruteSurv).take(5)}")
    // IVF: probes equal a from-scratch build over the survivors.
    val scratchSurv = s"$root/ivf_scratch_surv"
    IvfIndex.write(scratchSurv, corpusSurv, "doc_id", "embedding", cent)
    def probeSurvIvf(p: String) = IvfIndex.topK(spark, p, corpusSurv,
        "doc_id", "embedding", k = K, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probeSurvIvf(ivfPath) == probeSurvIvf(scratchSurv))
    // IVF-PQ: the delete masked doc 1 before the ADC cut — probes equal
    // a survivors-only scratch build under the same codebooks.
    assert(probePq(pqPath, corpusSurv) ==
      probePq(pqScratch(corpusSurv, "surv"), corpusSurv))
    // Token index: probes equal the inline scorer over the survivors'
    // tokens only (doc 1 masked before the tokenK cut).
    val probesC = toksOf(Seq(3L, 7L))
    def msNow() = canon(MaxSimIndex.topK(spark, msPath, probesC,
      "doc_id", "pos", "tv", k = K, tokenK = 4, simPrecision = 6))
    val wantSurv = canon(MaxSim.topKViaAnnMd5(probesC,
      toksOf(Seq(3L, 6L, 7L)), "doc_id", "pos", "tv", k = K, dims = 4,
      tokenK = 4, numPlanes = 3, tables = 2, simPrecision = 6))
    assert(msNow() == wantSurv && wantSurv.nonEmpty)

    // Replay safety, both layers. (a) The curation batchId guard: a
    // redelivered batch C is a complete no-op — no sink call, nothing
    // moves.
    val gv3 = GraphIndex.liveVersion(spark, gPath)
    val batchC = Seq(
      (1L, "u1", "", t("2024-01-01 10:20:00"),
        null.asInstanceOf[Array[Double]], "delete"),
      (7L, "u2", freshB, t("2024-01-01 10:20:05"), vec(7L), "add"))
      .toDF("doc_id", "user", "text", "ts", "embedding", "op")
    cur.processBatch(batchC, 2L, build(spark), Seq("user"), "price_ts",
      Seq("price"), opCol = Some("op"))(sink)
    assert(GraphIndex.liveVersion(spark, gPath) == gv3)
    // (b) A crash between sink and commit redelivers the SINK frame
    // (delete 1 + add 7): every writer must converge — the delete of an
    // already-folded id appends nothing, the add of a stored id drops,
    // no index moves.
    val taggedC = corpusSurv.filter(col("doc_id") === 7L)
      .withColumn("op", lit("add"))
      .unionByName(Seq((1L, "delete")).toDF("doc_id", "op"),
        allowMissingColumns = true)
    sink(taggedC, 2L)
    assert(GraphIndex.liveVersion(spark, gPath) == gv3,
      "redelivered delete+add wrote a graph generation")
    assert(edgeSet() == bruteSurv)
    assert(probeSurvIvf(ivfPath) == probeSurvIvf(scratchSurv))
    assert(msNow() == wantSurv)

    // ------------------------------------------------ update CDC leg
    // Batch D: same-id delete + add in ONE batch — a document UPDATE
    // (new text, re-embedded vector). The curation layer treats it as
    // delete-first-then-add; each index writer sequences its own
    // family's recipe (graph: tombstone+fold; IVF/token: delete →
    // compact inside the batch → append). Afterward every read-back
    // must serve doc 6's NEW state — not the old one, not both.
    val updText = "volunteer stewards chart the slow return of native " +
      "orchids across a rewilded quarry floor and debate grazing " +
      "schedules with the neighbouring farm over strong tea each spring"
    def vecU(i: Long): Array[Double] = vec(i + 40L)
    mem.addData(
      (6L, "u1", "", t("2024-01-01 10:30:00"),
        null.asInstanceOf[Array[Double]], "delete"),
      (6L, "u1", updText, t("2024-01-01 10:30:01"), vecU(6L), "add"))
    val q4 = start()
    q4.processAllAvailable(); q4.stop()

    assert(cur.corpus(spark).get
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      .get(6L).contains(updText), "corpus must hold doc 6's NEW text")
    val vecOf = (i: Long) => if (i == 6L) vecU(6L) else vec(i)
    val corpusUpd = surv.map(i => (i, vecOf(i)))
      .toDF("doc_id", "embedding")
    // Graph: edges equal brute top-k over the UPDATED corpus.
    val bruteUpd = Similarity.bruteForceTopK(corpusUpd, corpusUpd,
        "doc_id", "embedding", k = K)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet() == bruteUpd,
      s"missing=${(bruteUpd -- edgeSet()).take(5)} extra=${(edgeSet() -- bruteUpd).take(5)}")
    // IVF: probes equal a from-scratch build over the updated corpus —
    // the writer compacted the delete inside the batch, so the new
    // vector is LIVE, not masked.
    val scratchUpd = s"$root/ivf_scratch_upd"
    IvfIndex.write(scratchUpd, corpusUpd, "doc_id", "embedding", cent)
    def probeUpdIvf(p: String) = IvfIndex.topK(spark, p, corpusUpd,
        "doc_id", "embedding", k = K, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probeUpdIvf(ivfPath) == probeUpdIvf(scratchUpd))
    // IVF-PQ: the update re-encoded doc 6's NEW vector under the frozen
    // codebooks inside the batch (delete -> compact -> append).
    assert(probePq(pqPath, corpusUpd) ==
      probePq(pqScratch(corpusUpd, "upd"), corpusUpd))
    // Token index: probes equal the inline scorer over the updated
    // tokens (doc 6's OLD tokens folded away, new ones live).
    val toksUpd = (for { i <- Seq(3L, 6L, 7L); p <- 0 until 3 }
      yield (i, p, vecOf(i).slice(4 * p, 4 * p + 4)))
      .toDF("doc_id", "pos", "tv")
    val probesD = toksUpd.filter(col("doc_id").isin(3L, 6L))
    def msUpd() = canon(MaxSimIndex.topK(spark, msPath, probesD,
      "doc_id", "pos", "tv", k = K, tokenK = 4, simPrecision = 6))
    val wantUpd = canon(MaxSim.topKViaAnnMd5(probesD, toksUpd,
      "doc_id", "pos", "tv", k = K, dims = 4, tokenK = 4, numPlanes = 3,
      tables = 2, simPrecision = 6))
    assert(msUpd() == wantUpd && wantUpd.nonEmpty)

    // Replay safety: a redelivered UPDATE frame (crash between sink and
    // commit) converges on CONTENT — the pure-mask writers re-run the
    // delete→compact→append chain, so generations may advance, but
    // every read-back is unchanged.
    val taggedD = corpusUpd.filter(col("doc_id") === 6L)
      .withColumn("op", lit("add"))
      .unionByName(Seq((6L, "delete")).toDF("doc_id", "op"),
        allowMissingColumns = true)
    sink(taggedD, 3L)
    assert(edgeSet() == bruteUpd)
    assert(probeUpdIvf(ivfPath) == probeUpdIvf(scratchUpd))
    assert(probePq(pqPath, corpusUpd) ==
      probePq(s"$root/pq_scratch_upd", corpusUpd))
    assert(msUpd() == wantUpd)
  }
}
