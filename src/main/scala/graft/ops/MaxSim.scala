package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-interaction (multi-vector) retrieval — the ColBERT scoring rule
  * (Khattab & Zaharia, SIGIR'20): a document is represented by a BAG of
  * token vectors, not one pooled vector, and
  *
  *   MaxSim(q, d) = Σ_{query token t}  max_{doc token u}  cos(t, u)
  *
  * — each query token independently finds its best-matching document
  * token, so multi-aspect queries don't get averaged away (the reason
  * late interaction beats single-vector retrieval on out-of-domain
  * benchmarks at equal embedding budgets).
  *
  * Relational shape, two tiers (the ColBERT serving architecture):
  *   - EXACT scoring ([[scoreAll]]/[[topK]]): token-level cross scoring
  *     per (probe, candidate) pair — the per-pair cost is
  *     |q tokens|·|d tokens| dots, both bag sizes are MODEL constants
  *     (dozens), so cost is pairs·const. The probe bags broadcast; the
  *     per-pair token max and the per-pair token sum both happen INSIDE
  *     one grouped aggregation keyed by (query, doc) — tokens never
  *     shuffle alone.
  *   - CANDIDATE GENERATION at scale ([[topKViaAnn]]): exactly like
  *     ColBERT — each query TOKEN probes a token-level ANN (LSH here)
  *     for its nearest document tokens; the union of owning documents is
  *     the candidate set, then the exact MaxSim reranks only those. The
  *     corpus token table is never cross-joined.
  *
  * Determinism: the token fold is ordered by query-token position (a
  * fixed-order double sum), per-token maxima are over rounded cosines
  * when `simPrecision` ≥ 0 — the usual cross-engine replay contract.
  *
  * Ids keep their NATIVE type end to end (string document keys work on
  * both tiers — the struct token key and every join carry idCol as-is;
  * a long cast here would silently empty or throw on non-numeric keys,
  * the FilteredAnn broad-branch failure class).
  *
  * Input layout: one row per TOKEN — (idCol, posCol, vecCol). Pooled
  * single-vector tables turn into this shape with posexplode over a
  * slicing expression (see q_maxsim, which cuts 64-dim rows into four
  * 16-dim token vectors).
  */
object MaxSim {

  /** Exact MaxSim of every (probe, candidate) pair given token tables.
    * Returns (query_id, doc_id, maxsim).
    */
  def scoreAll(queryToks: DataFrame, docToks: DataFrame,
      idCol: String, posCol: String, vecCol: String,
      simPrecision: Int = -1): DataFrame = {
    val q = queryToks.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"),
        col(posCol).cast("int").as("__qp"), col(vecCol).as("__qv"),
        Similarity.norm(col(vecCol)).as("__qn"))
    val d = docToks.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(vecCol).as("__dv"),
        Similarity.norm(col(vecCol)).as("__dn"))
    val cosRaw = Similarity.dot(col("__qv"), col("__dv")) /
      (col("__qn") * col("__dn"))
    val cos = if (simPrecision >= 0) round(cosRaw, simPrecision) else cosRaw
    // Per (query, doc, query-token): the max over doc tokens — then the
    // ORDERED fold over query tokens (sort_array on (pos, max) structs),
    // so the double sum is position-ordered on any partitioning.
    broadcast(q).crossJoin(d)
      .select(col("query_id"), col("doc_id"), col("__qp"), cos.as("__c"))
      .groupBy("query_id", "doc_id", "__qp")
      .agg(max(col("__c")).as("__m"))
      .groupBy("query_id", "doc_id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__qp"), col("__m")))),
          s => s.getField("__m")),
        lit(0.0), (acc, x) => acc + x).as("maxsim"))
  }

  /** Exact top-k per probe over the full corpus (the brute baseline). */
  def topK(queryToks: DataFrame, docToks: DataFrame,
      idCol: String, posCol: String, vecCol: String, k: Int,
      simPrecision: Int = -1): DataFrame =
    rank(scoreAll(queryToks, docToks, idCol, posCol, vecCol,
      simPrecision), k)

  /** The scale path: token-level LSH candidate generation, exact MaxSim
    * rerank over only the candidate documents — per probe, the rerank
    * touches ≤ |q tokens|·tokenK owning documents instead of the corpus.
    */
  def topKViaAnn(queryToks: DataFrame, docToks: DataFrame,
      idCol: String, posCol: String, vecCol: String, k: Int,
      tokenK: Int = 32, numPlanes: Int = 8, tables: Int = 2,
      simPrecision: Int = -1): DataFrame =
    topKViaAnnImpl(queryToks, docToks, idCol, posCol, vecCol, k,
      simPrecision,
      (q, d) => Similarity.lshTopK(q, d, "tok", "__v", tokenK,
        numPlanes, tables))

  /** [[topKViaAnn]] on md5-derived planes — the oracle-parity variant
    * (the lshTopKMd5 relationship): a SQL engine replays token
    * bucketing, the per-query-token candidate cut and the exact MaxSim
    * rerank end to end (`q_maxsim_ann`). `dims` is the TOKEN dimension.
    */
  def topKViaAnnMd5(queryToks: DataFrame, docToks: DataFrame,
      idCol: String, posCol: String, vecCol: String, k: Int, dims: Int,
      tokenK: Int = 32, numPlanes: Int = 6, tables: Int = 2,
      simPrecision: Int = -1): DataFrame =
    topKViaAnnImpl(queryToks, docToks, idCol, posCol, vecCol, k,
      simPrecision,
      (q, d) => Similarity.lshTopKMd5(q, d, "tok", "__v", tokenK, dims,
        numPlanes, tables))

  private def topKViaAnnImpl(queryToks: DataFrame, docToks: DataFrame,
      idCol: String, posCol: String, vecCol: String, k: Int,
      simPrecision: Int,
      ann: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    // Token-level probes need a unique token id for the ANN call; the
    // key is a STRUCT (side, id, pos) rather than an arithmetic packing —
    // no position cap, no overflow, and the side tag makes the query and
    // doc keyspaces DISJOINT, so lshTopK's query_id =!= neighbor_id
    // self-exclusion (written for symmetric single-table ANN) never
    // removes a probe's own-document token pair: when probes are drawn
    // from the corpus, the self document — the true rank-1 MaxSim — must
    // stay reachable through candidate generation.
    def tokKey(side: String, pos: Column) =
      struct(lit(side).as("side"), col(idCol).as("id"),
        pos.cast("int").as("pos"))
    val q = queryToks.filter(col(vecCol).isNotNull)
      .select(tokKey("q", col(posCol)).as("tok"), col(vecCol).as("__v"))
    val d = docToks.filter(col(vecCol).isNotNull)
      .select(tokKey("d", col(posCol)).as("tok"), col(vecCol).as("__v"))
    val hits = ann(q, d)
    val cand = hits
      .select(col("query_id.id").as("query_id"),
        col("neighbor_id.id").as("doc_id"))
      .distinct()
    // Exact rerank on candidates only: same grouped-aggregation shape as
    // scoreAll, restricted by the candidate semi-join.
    val qt = queryToks.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"),
        col(posCol).cast("int").as("__qp"), col(vecCol).as("__qv"),
        Similarity.norm(col(vecCol)).as("__qn"))
    val dt = docToks.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(vecCol).as("__dv"),
        Similarity.norm(col(vecCol)).as("__dn"))
    rerankCandidates(cand, qt, dt, k, simPrecision)
  }

  /** The exact-rerank tail shared by the inline ANN path and
    * [[MaxSimIndex.topK]] — ONE copy of the per-token max, the
    * position-ordered fold and the rank window, so the persisted path's
    * bit-parity contract cannot drift from the inline one. `qt` must
    * carry (query_id, __qp, __qv, __qn); `dt` (doc_id, __dv, __dn).
    */
  private[ops] def rerankCandidates(cand: DataFrame, qt: DataFrame,
      dt: DataFrame, k: Int, simPrecision: Int): DataFrame = {
    val cosRaw = Similarity.dot(col("__qv"), col("__dv")) /
      (col("__qn") * col("__dn"))
    val cos = if (simPrecision >= 0) round(cosRaw, simPrecision) else cosRaw
    val scored = cand
      .join(qt, Seq("query_id"))
      .join(dt, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("__qp"), cos.as("__c"))
      .groupBy("query_id", "doc_id", "__qp")
      .agg(max(col("__c")).as("__m"))
      .groupBy("query_id", "doc_id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__qp"), col("__m")))),
          s => s.getField("__m")),
        lit(0.0), (acc, x) => acc + x).as("maxsim"))
    rank(scored, k)
  }

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("maxsim").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("maxsim"))
  }
}
