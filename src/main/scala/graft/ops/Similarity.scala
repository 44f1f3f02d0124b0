package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — correct, oracle-checkable, O(Q·N).
  * Scale path: LSH bucketing by random-hyperplane sign bits (deterministic
  * pseudo-random planes derived from xxhash64 so every executor — and the
  * oracle — derives identical planes without shipping state), which turns
  * the N×N candidate space into per-bucket joins.
  *
  * All arithmetic is done in DOUBLE with left-to-right accumulation
  * (`aggregate` over `zip_with`) so results are bit-reproducible across
  * partitionings and match a sequential oracle.
  */
object Similarity {

  /** Dot product of two array columns, accumulated in double, in order.
    * Codegen'd tight loop ([[graft.expr.VecDot]]) — the HOF
    * `aggregate(zip_with(...))` form runs interpreted per element and was
    * the bench's hottest spot.
    */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExprs.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each probe row, the k nearest build rows.
    * Probe set is expected small (a query batch); build side is the corpus.
    * The cross join broadcasts the probe side; ranking is a window per
    * probe id — shuffle on probe id only. Deterministic tie-break on
    * neighbor id.
    */
  def bruteForceTopK(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // Norms computed ONCE per row before the pair join (norm-per-pair would
    // redo the reduction |corpus| times per probe). NULL vectors dropped —
    // uniform policy with lshTopK/ivfTopK (a NULL cosine can't rank).
    val p = probes.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
    val pairs = broadcast(p).crossJoin(c)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("cos", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Brute-force top-k via the typed [[TopKAggregator]]: identical result
    * to [[bruteForceTopK]], but the per-query reduction happens as a
    * PARTIAL aggregation before the shuffle — the exchange carries
    * O(partitions × k) rows instead of every scored pair, which is the
    * formulation that survives |probes| × |corpus| growth.
    */
  def bruteForceTopKAgg(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // Same NULL-vector drop policy as bruteForceTopK/lshTopK/ivfTopK.
    val p = probes.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
    val pairs = broadcast(p).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id").as("__id"),
        (dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("__score"))
    pairs
      .groupBy(col("query_id"))
      .agg(TopKAggregator(k, col("__id"), col("__score")).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Sign-bit LSH bucket id from `numPlanes` deterministic xxhash64-derived
    * hyperplanes; `seedOffset` selects an independent hash table's plane
    * family. One codegen'd pass over the vector
    * ([[graft.expr.HyperplaneBuckets]]; bit-identical to the previous
    * interpreted `aggregate(zip_with(...))`-per-plane stack).
    */
  def lshBucket(vec: Column, numPlanes: Int, seedOffset: Int = 0): Column =
    graft.expr.VectorExprs.lshBucket(vec, numPlanes, seedOffset)

  /** ANN top-k via LSH buckets: candidates share a bucket with the probe
    * (optionally multi-probe across several plane sets), ranked by exact
    * cosine. Trades recall for a bucket-local join — the 100 TB shape.
    */
  def lshTopK(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 8, tables: Int = 2): DataFrame =
    lshTopKImpl(probes, corpus, idCol, vecCol, k, numPlanes, tables,
      (vec, t) => lshBucket(vec, numPlanes, seedOffset = t * numPlanes))

  /** md5-derived hyperplane components, reproducible in any engine with
    * md5: `comp(p, d) = md5Hash60("p_<p>_<d>") / 2^59 - 1.0` ∈ [-1, 1).
    * Division by a power of two and the subtraction are exact in double,
    * so both engines derive bit-identical planes from their own md5.
    */
  /** Symmetric int8 quantization of an embedding column — the storage and
    * shuffle compressor for corpus-scale vectors (float32 → int8 is the
    * difference between 100 TB and 25 TB of embeddings, and integer dot
    * products are both faster and EXACT, so downstream scoring is
    * rerun-reproducible in a way float accumulation is not).
    *
    * Per vector: `scale = max(|x_i|)` and
    * `q_i = floor(x_i/scale * 127 + 0.5)` ∈ [-127, 127], with the
    * division/multiply in DOUBLE (float32 inputs widen exactly; every
    * engine's IEEE double ops then agree bit-for-bit, so quantized codes
    * are engine-portable — the property `q_embedding_quantize` gates).
    * Zero vectors quantize to all-zero codes with scale 0. Map-only.
    *
    * Reconstruction: `x̂_i = q_i * scale / 127`, max error `scale/254`
    * per component (half a quantization step).
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = array_max(transform(vec, x => abs(x)))
    val q = transform(vec, x =>
      when(scale === 0f, lit(0))
        .otherwise(floor(x.cast("double") / scale.cast("double") * lit(127.0)
          + lit(0.5)).cast("int")))
    struct(scale.as("scale"), q.as("codes"))
  }

  /** Exact integer dot product of two int8 code arrays, rescaled to the
    * float domain: `Σ qa_i·qb_i` is a BIGINT (no re-association drift);
    * only the final rescale touches floating point.
    *
    * Routed through the codegen'd [[graft.expr.Int8Vec]] pair (pack →
    * fused byte-dot) rather than `aggregate(zip_with(...))`: Spark's
    * higher-order functions run interpreted per element — the round-1
    * benchmark's hottest spot — while the packed form is one tight
    * generated loop per row.
    */
  def dotQuantized(a: Column, b: Column): Column = {
    val intDot = graft.expr.Int8Vec.int8Dot(
      graft.expr.Int8Vec.packInt8(a.getField("codes")),
      graft.expr.Int8Vec.packInt8(b.getField("codes")))
    // Dimension mismatch surfaces as NULL (the zip_with-form contract),
    // not a truncated-but-plausible similarity: Int8Dot alone lets the
    // shorter input decide the length, which would hide a stale-index /
    // re-embed data bug inside valid-looking top-k results.
    val scaled = intDot.cast("double") * a.getField("scale").cast("double") *
      b.getField("scale").cast("double") / lit(127.0 * 127.0)
    when(size(a.getField("codes")) === size(b.getField("codes")), scaled)
  }

  /** Generalized md5-derived component family: `tag_<plane>_<d>` → a
    * double in [−1, 1). The SINGLE copy of the /2⁵⁹−1 scaling recipe —
    * LSH planes and [[RandomProjection]] both derive through here so the
    * oracle-parity formula cannot drift between copies.
    */
  def md5Components(tag: String, plane: Int, dims: Int): Array[Double] =
    Array.tabulate(dims)(d =>
      graft.expr.Md5Hex.long60(s"${tag}_${plane}_$d").toDouble /
        (1L << 59).toDouble - 1.0)

  def md5PlaneComponents(plane: Int, dims: Int): Array[Double] =
    md5Components("p", plane, dims)

  /** [[lshTopK]] with md5-derived planes baked as literal arrays — the
    * oracle-parity variant (same trick as [[Dedup.simHashMd5]]). The
    * projection is still the codegen'd [[graft.expr.VecDot]] against a
    * constant plane vector; prod stays on the xxhash64 planes.
    */
  def lshTopKMd5(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int,
      numPlanes: Int = 8, tables: Int = 2): DataFrame = {
    val bucketFn = (vec: Column, t: Int) =>
      graft.expr.VectorExprs.planeBuckets(vec,
        Array.tabulate(numPlanes)(p => md5PlaneComponents(t * numPlanes + p, dims)))
    lshTopKImpl(probes, corpus, idCol, vecCol, k, numPlanes, tables, bucketFn)
  }

  /** All same-LSH-bucket pairs above an EXACT cosine threshold — the
    * bucketed eps-pair generator for density operators ([[graft.ml.Dbscan]],
    * clustering over near-dup graphs): candidate fan-out is Σ|bucket|²
    * per table (never all-pairs), every candidate is then verified with
    * the exact cosine so false bucket collisions cannot leak through —
    * only RECALL is approximate (a pair can miss every table), which is
    * the documented LSH trade the caller tunes with planes/tables.
    * md5-derived planes, so a SQL oracle replays the buckets exactly.
    */
  def lshPairsMd5(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dims: Int, numPlanes: Int, tables: Int,
      targetBucket: Int = 0): DataFrame = {
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__n"))
    // LSH granularity MUST scale with the corpus or the within-bucket
    // pair volume is quadratic: fixed planes ⇒ fixed bucket COUNT ⇒
    // bucket size ∝ n ⇒ Σ|bucket|² ∝ n² — the r13 IVF nlist lesson, LSH
    // edition (the r14 100× rehearsal OOM'd q_dbscan_lsh's pair
    // aggregate exactly this way). With `targetBucket` > 0 the plane
    // count grows as log2(n/targetBucket) so expected occupancy stays
    // ~targetBucket and pair volume ~n·targetBucket·tables/2 — linear.
    // Locality-aware splitting (more hyperplanes), not a random
    // sub-bucket sample: a finer LSH still groups by direction. A no-op
    // whenever log2(n/targetBucket) ≤ numPlanes — in particular at the
    // oracle tiers, so the fixed-plane DuckDB replay is unaffected.
    val planes =
      if (targetBucket <= 0) numPlanes
      else {
        val n = math.max(1L, c.count())
        math.max(numPlanes, 64 - java.lang.Long
          .numberOfLeadingZeros(math.max(1L, (n - 1) / targetBucket)))
      }
    val bucketed = (0 until tables).map { t =>
      c.withColumn("__t", lit(t))
        .withColumn("__b", graft.expr.VectorExprs.planeBuckets(col("__v"),
          Array.tabulate(planes)(p =>
            md5PlaneComponents(t * planes + p, dims))))
    }.reduce(_ unionAll _)
    val a = bucketed.select(col("__t"), col("__b"), col("__id").as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = bucketed.select(col("__t"), col("__b"), col("__id").as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__t", "__b"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("__va"), col("__vb")) /
        (col("__na") * col("__nb")) > threshold)
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Multi-probe LSH (Lv et al., VLDB'07 shape, single-bit ring): each
    * probe also visits `flips` Hamming-1 buckets, recovering most of an
    * extra table's recall for ZERO extra index storage and corpus passes
    * — at 100 TB the index (corpus side) dominates cost, so spending
    * probe-side fan-out instead of corpus-side tables is the right trade.
    * Candidate fan-out grows ≤ (1+flips)× on the probe side only; the
    * corpus is still bucketed once per table.
    */
  def lshTopKMultiProbe(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 8, tables: Int = 1, flips: Int = 4): DataFrame =
    lshTopKImpl(probes, corpus, idCol, vecCol, k, numPlanes, tables,
      (vec, t) => lshBucket(vec, numPlanes, seedOffset = t * numPlanes),
      probeFlips = flips)

  /** [[lshTopKMultiProbe]] on md5-derived planes — the oracle-parity
    * variant (`q_ann_mp_lsh_topk`).
    */
  def lshTopKMd5MultiProbe(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int,
      numPlanes: Int = 8, tables: Int = 1, flips: Int = 4): DataFrame = {
    val bucketFn = (vec: Column, t: Int) =>
      graft.expr.VectorExprs.planeBuckets(vec,
        Array.tabulate(numPlanes)(p => md5PlaneComponents(t * numPlanes + p, dims)))
    lshTopKImpl(probes, corpus, idCol, vecCol, k, numPlanes, tables, bucketFn,
      probeFlips = flips)
  }

  /** IVF-flat ANN: coarse-quantize the corpus into inverted lists (each
    * row joins its nearest centroid's list), probe the `nprobe` nearest
    * lists per query, rank candidates by exact cosine.
    *
    * Centroids are deterministic data samples — every row whose id ≡ 0
    * (mod `centroidMod`) AND id < `centroidCap` — so the whole operator
    * is reproducible in plain SQL for the oracle and needs no training
    * job; a production build swaps in k-means centroids (fixed
    * nlist ≪ n) and every plan shape below survives unchanged:
    * assignment is a broadcast map-side argmax, the inverted-list build
    * shuffles each vector ONCE keyed by its list, and the probe join is
    * list-bucketed — never all-pairs.
    *
    * `centroidCap` is what keeps nlist FIXED when the corpus grows: an
    * uncapped id-mod sample scales nlist with n, which turns the n·nlist
    * assignment into n²/mod — the r13 100× rehearsal OOM'd exactly
    * there. Cap the sample (or use a learned codebook) so assignment
    * stays linear.
    */
  def ivfTopK(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroidMod: Int = 25, nprobe: Int = 3,
      centroidCap: Long = Long.MaxValue): DataFrame = {
    // NULL vectors can neither index nor be found (their cosine is NULL):
    // drop them up front, same policy as lshTopKImpl.
    val cent = corpus.filter(col(vecCol).isNotNull)
      .filter(pmod(col(idCol), lit(centroidMod)) === 0 &&
        col(idCol) < centroidCap)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    // An empty centroid sample (no id divisible by centroidMod) would
    // silently return zero neighbors for every query — fail loudly
    // instead. The guard is IN-QUERY, not an eager isEmpty action: the
    // operator constructor launches zero jobs. It is a UNION branch, not
    // a joined side — AQE's empty-relation propagation can skip a join's
    // build side when the probe stage lands empty, but a union executes
    // every child: the guard's count row always evaluates, assert_true
    // raises on an empty codebook, and on the healthy path the
    // always-false filter contributes zero rows.
    val result =
      ivfTopKWith(probes, corpus, idCol, vecCol, k, cent, "__cid", "__cv", nprobe)
    val guard = cent.agg(count(lit(1)).as("__ncent"))
      .filter(assert_true(col("__ncent") > 0,
        lit(s"ivfTopK sampled no centroids: no $idCol divisible by " +
          s"$centroidMod")).isNotNull)
      .select(result.schema.fields.map(f =>
        lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    // Known cost, accepted: the union re-evaluates the (cheap) centroid
    // filter once more and widens output nullability — the price of a
    // guard that AQE cannot elide.
    result.unionByName(guard)
  }

  /** IVF-flat against a CALLER-SUPPLIED codebook — the production shape:
    * pair with [[graft.ml.KMeans.centroidFrame]] so the inverted lists
    * follow learned Voronoi cells (tighter than data-sampled centroids →
    * better recall at the same `nprobe`). Plan shape is identical to
    * [[ivfTopK]]: broadcast codebook, one list-keyed shuffle for the
    * index, list-bucketed probe join — never all-pairs.
    */
  def ivfTopKWith(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: DataFrame, centIdCol: String = "centroid_id",
      centVecCol: String = "centroid", nprobe: Int = 3): DataFrame = {
    val cent = centFrame(centroids, centIdCol, centVecCol)
    probeInvertedLists(probes, idCol, vecCol, k, cent,
      invertedLists(corpus, idCol, vecCol, cent), nprobe)
  }

  /** Coarse-ROUTING drift of a delta cohort against the build cohort
    * under ONE frozen coarse codebook — the IVF-side refit trigger,
    * [[graft.ml.Pq.quantizationDrift]]'s sibling for the routing layer:
    * appends under a stored codebook stay exact
    * ([[IvfIndex.append]]), but a corpus that drifts from the
    * codebook's fit distribution routes with falling best-cosine — the
    * Voronoi cells stop matching the data, and probe recall at fixed
    * `nprobe` decays silently. Per-row error is the 1e-4-quantized
    * angular slack `round((1 − best cos)·10⁴)` as BIGINT — quantizing
    * BEFORE the sum keeps the aggregate integer-exact and
    * engine-portable (oracle `q_ivf_drift`; a raw double sum's hash
    * flaps with accumulation order). Each cohort costs the assignment
    * stage's scan: one broadcast codebook cross-join + a map-side-
    * combined max per row.
    *
    * One row: (build_n, build_err, delta_n, delta_err, drift_ratio)
    * with drift_ratio = mean(delta err) / mean(build err) — re-cluster
    * the codebook + [[IvfIndex.write]] when it clears the deployment's
    * threshold, exactly the [[graft.ops.PqIndex.refit]] cadence on the
    * PQ side.
    */
  def routingDrift(build: DataFrame, delta: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame,
      centIdCol: String = "centroid_id",
      centVecCol: String = "centroid"): DataFrame = {
    val cent = centFrame(centroids, centIdCol, centVecCol)
    def errOf(df: DataFrame, tag: String): DataFrame =
      routingErrAgg(df, idCol, vecCol, cent)
        .select(col("n").as(s"${tag}_n"), col("err").as(s"${tag}_err"))
    errOf(build, "build").crossJoin(errOf(delta, "delta"))
      .select(col("build_n"), col("build_err"), col("delta_n"),
        col("delta_err"),
        round((col("delta_err") / col("delta_n")) /
          (col("build_err") / col("build_n")), 4).as("drift_ratio"))
  }

  /** `(n, err)` = row count and Σ `round((1 − best cos)·10⁴)` of `df`
    * routed against the NORMALIZED broadcast codebook `cent`
    * ((__cid, __cv, __cn) — [[centFrame]] / `IvfIndex.storedCentFrame`
    * shape) — the ONE argmax assignment scan every routing-drift
    * surface shares ([[routingDrift]], `IvfIndex.routingDrift`,
    * `StreamingIvfDrift`, `StreamingIvfRefit`). Quantizing each row at
    * 1e-4 BEFORE the sum keeps the aggregate integer-exact and
    * engine-portable (the `q_ivf_drift` oracle replays exactly this);
    * changing the granularity or the null policy here is the only
    * place to change it.
    */
  private[graft] def routingErrAgg(df: DataFrame, idCol: String,
      vecCol: String, cent: DataFrame): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__n"))
      .crossJoin(broadcast(cent))
      .withColumn("__acos",
        dot(col("__v"), col("__cv")) / (col("__n") * col("__cn")))
      .groupBy(col("__id"))
      .agg(max(col("__acos")).as("__best"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(round((lit(1.0) - col("__best")) * 10000).cast("long"))
          .cast("long").as("err"))

  /** Normalized codebook frame: (__cid, __cv double[], __cn). The single
    * shape both the inline IVF path and the persisted [[IvfIndex]] share.
    */
  private[ops] def centFrame(centroids: DataFrame, centIdCol: String,
      centVecCol: String): DataFrame =
    centroids
      .select(col(centIdCol).as("__cid"),
        col(centVecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))

  /** Inverted lists: each corpus row → its argmax-cosine centroid
    * (deterministic tie-break on centroid id). Argmax as `max_by` over a
    * (score, -cid) struct, NOT a row_number window: the groupBy gets a
    * map-side partial combine, so the exchange carries one row per corpus
    * vector instead of one per (vector, centroid) pair — at nlist
    * centroids that is an nlist× narrower assignment shuffle.
    * Output: (__list, neighbor_id, __nv, __nn).
    */
  private[ops] def invertedLists(corpus: DataFrame, idCol: String,
      vecCol: String, cent: DataFrame): DataFrame = {
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"),
        norm(col(vecCol)).as("__nn"))
    c.crossJoin(broadcast(cent))
      .withColumn("__acos",
        dot(col("__nv"), col("__cv")) / (col("__nn") * col("__cn")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(
        struct(col("__cid"), col("__nv"), col("__nn")),
        struct(col("__acos"), (-col("__cid")).as("__tb"))).as("__best"))
      .select(col("__best.__cid").as("__list"), col("neighbor_id"),
        col("__best.__nv").as("__nv"), col("__best.__nn").as("__nn"))
  }

  /** Probe leg over prebuilt inverted lists: route each query to its
    * `nprobe` nearest lists, list-bucketed candidate join, exact-cosine
    * rank. `lists` may be the inline [[invertedLists]] frame or a
    * persisted index read back ([[IvfIndex]]) — same contract either way.
    */
  private[ops] def probeInvertedLists(
      probes: DataFrame, idCol: String, vecCol: String, k: Int,
      cent: DataFrame, lists: DataFrame, nprobe: Int): DataFrame = {
    val cand = ivfCandidates(probes, idCol, vecCol, cent, lists, nprobe)
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("__qv"), col("__nv")) / (col("__qn") * col("__nn"))).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** The IVF candidate stage alone: route each probe to its `nprobe`
    * nearest lists and emit the in-list (query_id, neighbor_id) pairs
    * with both sides' vectors/norms attached — the scoring policy
    * (exact cosine, ADC codes, …) is the caller's.
    */
  /** The probe-routing half of [[ivfCandidates]] alone: each probe's
    * `nprobe` nearest cells — (__list, query_id, __qv, __qn). Exposed
    * separately so a persisted index ([[PqIndex]]) can derive its
    * partition-prune set from the IDENTICAL routing (same tie-break)
    * without re-executing the corpus-side candidate join.
    */
  private[ops] def probeRouting(
      probes: DataFrame, idCol: String, vecCol: String,
      cent: DataFrame, nprobe: Int): DataFrame = {
    val p = probes.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"))
    val wP = Window.partitionBy("query_id")
      .orderBy(col("__acos").desc, col("__cid").asc)
    // Route on a SLIM projection: the |probes|·nlist rows entering the
    // top-nprobe window carry (query_id, cid, score) — 24 bytes — and
    // the probe VECTOR re-joins after the cut. Leaving __qv on the
    // window input drags dims·8 bytes per scored pair through the
    // routing shuffle and the per-probe sort buffers: at nlist ∝ √n and
    // a probe set scaling with the corpus that is the first allocation
    // to die (measured: the 100× PQ rehearsal OOM'd an 8 GB heap on
    // exactly this window before the slimming).
    val routed = p.crossJoin(broadcast(cent))
      .select(col("query_id"), col("__cid"),
        (dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
          .as("__acos"))
      .withColumn("__r", row_number().over(wP)).filter(col("__r") <= nprobe)
      .select(col("__cid").as("__list"), col("query_id"))
    routed.join(p, Seq("query_id"))
      .select(col("__list"), col("query_id"), col("__qv"), col("__qn"))
  }

  private[ops] def ivfCandidates(
      probes: DataFrame, idCol: String, vecCol: String,
      cent: DataFrame, lists: DataFrame, nprobe: Int): DataFrame =
    // Each corpus row lives in exactly one list → no cross-list dupes.
    probeRouting(probes, idCol, vecCol, cent, nprobe)
      .join(lists, Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))

  /** IVF-PQ retrieval — the FAISS IVFPQ serving shape, composed from
    * this file's coarse quantizer and [[graft.ml.Pq]]'s compressed
    * scorer: the codebook routes each probe to `nprobe` Voronoi lists,
    * ADC over the m-byte PQ codes ranks ONLY in-list candidates to
    * `candidateK`, and exact cosine re-scores those few to top-k. At
    * corpus scale the full-vector column is read exactly twice (index
    * build + the |probes|·candidateK rerank rows); the per-probe scan
    * is list-bucketed code lookups — the architecture billion-vector
    * retrieval actually deploys.
    *
    * Tuning (measured, BASELINE.md "Round-12 ANN recall/latency
    * curves", sf0.1 embeddings, recall@10 vs brute truth):
    * `candidateK` is the binding knob — recall rises monotonically with
    * it at ~flat latency (k → 2k → 4k: 0.06 → 0.10 → 0.18 on this
    * corpus) because the coarse 4-subspace code can't rank finely, so
    * the exact rerank needs headroom; set `candidateK ≥ 4·k`. `nprobe`
    * past 4 bought nothing once candidateK capped the pipeline — 4 is
    * the measured knee and the default below. For the coarse quantizer
    * itself, a LEARNED codebook ([[ivfTopKWith]] + k-means at
    * nlist ≈ √n) gave ~1.5× the recall of id-sampled centroids at
    * equal nprobe AND lower latency — prefer it whenever a fit pass is
    * affordable.
    */
  def ivfPqTopK(probes: DataFrame, corpus: DataFrame, codes: DataFrame,
      idCol: String, vecCol: String, model: graft.ml.Pq.PqModel, k: Int,
      candidateK: Int, centroidMod: Int = 25, nprobe: Int = 4,
      centroidCap: Long = Long.MaxValue): DataFrame = {
    require(candidateK >= k, "candidateK must be >= k")
    // centroidCap is the ivfTopK nlist∝n guard (the r13 lesson, caught
    // again here by the 100× PQ rehearsal): a pure id-mod sample grows
    // nlist with the corpus, and |probes|·nlist routing plus n·nlist
    // assignment both go quadratic. Cap the sampled id range so nlist
    // saturates; production callers should pass a learned √n codebook.
    val centRaw = corpus.filter(col(vecCol).isNotNull)
      .filter(pmod(col(idCol), lit(centroidMod)) === 0 &&
        col(idCol) < centroidCap)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))
    val cent = centFrame(centRaw, "centroid_id", "centroid")
    val lists = invertedLists(corpus, idCol, vecCol, cent)
    val pairs = ivfCandidates(probes, idCol, vecCol, cent, lists, nprobe)
      .select("query_id", "neighbor_id")
    graft.ml.Pq.exactRerank(
      graft.ml.Pq.adcTopKWithin(probes, codes, pairs, idCol, vecCol,
        model, candidateK),
      probes, corpus, idCol, vecCol, k)
  }

  private def lshTopKImpl(
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int, tables: Int,
      bucketFn: (Column, Int) => Column,
      probeFlips: Int = 0): DataFrame = {
    val withBuckets = (df: DataFrame, prefix: String, flips: Int) => {
      val buckets = array((0 until tables).flatMap { t =>
        val base = bucketFn(col(vecCol), t)
        // Multi-probe: besides its own bucket, a probe also visits the
        // `flips` Hamming-1 neighbors (flip plane f's sign bit) — the
        // planes a borderline projection most plausibly landed across.
        struct(lit(t).as("t"), base.as("b")) +:
          (0 until flips).map(f =>
            struct(lit(t).as("t"), base.bitwiseXOR(lit(1L << f)).as("b")))
      }: _*)
      // A NULL vector cannot have neighbors (its cosine is NULL): drop it
      // BEFORE bucketing, or it would ride the all-bits-unset bucket into
      // the join and surface in top-k with a NULL score.
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"__${prefix}v"),
        explode(buckets).as("__bt"))
        .select(col(s"${prefix}_id"), col(s"__${prefix}v"),
          col("__bt.t").as("__t"), col("__bt.b").as("__b"))
    }
    val p = withBuckets(probes, "query", probeFlips)
    val c = withBuckets(corpus, "neighbor", 0)
    // Score BEFORE the cross-table dedup: cos is identical for a pair seen
    // in several tables, so distinct on (ids, cos) is equivalent — and the
    // dedup shuffle then carries 3 scalars per row instead of two vectors.
    val cand = p.join(c, Seq("__t", "__b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__queryv"), col("__neighborv")).as("cos"))
      .distinct()
    // HOT-BUCKET PRE-CUT: a boilerplate corpus vector (think one token
    // shared by half the documents) puts half the candidate table into
    // ONE probe's window partition — the per-probe row_number would then
    // sort a corpus-sized partition in a single task. Cut each probe's
    // candidates to k within every PHYSICAL partition first: a row in
    // the global top-k is top-k inside whatever partition holds it, so
    // the pre-cut is exact regardless of row placement (two plan
    // instantiations may place rows differently — the pre-cut SET can
    // differ, the surviving top-k cannot), and the final window sees
    // ≤ partitions·k rows per probe. The (query_id, __pp) grouping key
    // spreads a hot probe across its source partitions, so no task ever
    // sorts more than one partition's candidates. spark_partition_id is
    // safe here for exactly that superset reason — contrast the tiled
    // prefix-sum ban, where the partition id KEYED an offset join.
    val wp = Window.partitionBy("query_id", "__pp")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val pre = cand
      .withColumn("__pp", spark_partition_id())
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= k)
      .drop("__pp", "__pr")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pre.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
