package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators — the reference's constraint-based dedup
  * (`UNIQUE` + `INSERT OR IGNORE`, `/root/reference/src/1_fetch_data.py:64-71`,
  * keep-first `drop_duplicates`, `/root/reference/src/3_transform_data.py:424-431`)
  * plus the LLM-pipeline near-dup family (MinHash/LSH, SimHash, n-gram
  * Jaccard, embedding cosine).
  *
  * All exact variants are hash-groupBy/window formulations: one shuffle on
  * the dedup key, no driver-side state, no collect. Spark's plain
  * `dropDuplicates` keeps an ORDER-NONDETERMINISTIC row; everything here
  * uses an explicit deterministic tie-break so re-runs (and a 1000-executor
  * cluster) reproduce byte-identical output.
  */
object Dedup {

  /** Keep exactly one row per key: the one minimizing `orderCols`.
    * Deterministic replacement for `dropDuplicates(keys)`.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup via md5 of a normalized text column. Returns the
    * surviving rows (min `idCol` per digest). Hash-groupBy: the 100 TB shape
    * — shuffle moves only (digest, id), not the documents.
    *
    * `idCol` must be unique (the usual contract for a document id): the
    * survivor semi-join keys on the id alone, so duplicate ids would keep
    * every row sharing a surviving id.
    */
  def exactByDigest(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val survivors = df
      .select(col(idCol), md5(normalizeText(col(textCol))).as("__digest"))
      .groupBy("__digest").agg(min(col(idCol)).as(idCol))
    // Survivor ids are unique, so a semi-join on the id alone suffices —
    // the original rows never recompute the digest and the exchange
    // carries no digest column.
    df.join(survivors.select(idCol), Seq(idCol), "left_semi")
  }

  /** Lowercase, collapse whitespace, trim — the canonical form used by all
    * content-hash dedup variants.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Word n-gram shingles of a text column as an array column — one
    * codegen'd pass per row (see [[graft.expr.WordShingles]]; the
    * higher-order-function formulation ran interpreted per position).
    */
  def shingles(c: Column, n: Int): Column =
    graft.expr.WordShingles.shingles(c, n)

  /** Deterministic 64-bit hash of a shingle with a seed, via xxhash64. */
  private def seededHash(c: Column, seed: Int): Column = xxhash64(lit(seed), c)

  /** md5 double-hash MinHash signatures (Kirsch–Mitzenmacher family):
    * ONE md5 per shingle split into two independent 58-bit halves
    * (hex chars 1–15 and 16–30 of the 128-bit digest), seed family
    * `h1 + s·h2` — cross-engine reproducible (any engine with md5 and
    * 64-bit integers replicates it) at 1 md5 per shingle instead of
    * `numHashes`. 58-bit hashes keep `h1 + 15·h2 < 2^63` (no signed
    * overflow on either engine).
    *
    * Accuracy caveat (measured): the `h1 + s·h2` family's slot minima are
    * CORRELATED — a shingle with a small h1 and small h2 tends to win many
    * slots at once — so band buckets are denser and candidate pairs more
    * numerous than with independent hashes (~26× at sf0.1, 16 hashes / 8
    * bands). Candidates remain a superset-biased estimate and downstream
    * exact verification (e.g. [[ngramJaccardSparse]]) is unaffected, but
    * production paths should prefer [[minHashSignatures]] (independent
    * xxhash64 seeds); this family exists for cross-engine verification.
    */
  def md5MinHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame = {
    require(numHashes <= 16, "h1 + s*h2 with 58-bit hashes overflows past s=15")
    def half(hex: Column, pos: Int): Column =
      conv(substring(hex, pos, 15), 16, 10).cast("long") % lit(1L << 58)
    val exploded = df.select(col(idCol),
      explode(graft.expr.WordShingles.shingles(col(textCol), shingleSize)).as("__sh"))
      // materialize the hex once so both halves share one md5 evaluation
      .select(col(idCol), md5(col("__sh")).as("__hex"))
      .select(col(idCol),
        half(col("__hex"), 1).as("__h1"),
        half(col("__hex"), 16).as("__h2"))
    val aggs = (0 until numHashes).map(s =>
      min(col("__h1") + lit(s.toLong) * col("__h2")).as(s"__h$s"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(s => col(s"__h$s")): _*).as("__sig"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum hash over the row's shingle set. Pure expression tree — stays
    * inside whole-stage codegen, no UDF. (Array-lambda form; the relational
    * explode+agg form in [[minHashSignatures]] is the fast path.)
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { s =>
      array_min(transform(shingleCol, x => seededHash(x, s)))
    }: _*)

  /** Relational MinHash signatures: build shingles in one codegen'd eval
    * ([[graft.expr.WordShingles]]), explode, compute every seeded hash in a
    * codegen'd projection, min them back per doc with a partially-aggregated
    * groupBy. Same result as [[minHashSignature]], but the per-element work
    * runs inside whole-stage codegen instead of the interpreted
    * higher-order-function path, and the ONE shuffle (partial-agg'd on the
    * doc id) is the 100 TB shape. (Round 1 stitched shingles with a
    * posexplode + lead() window, which cost an extra shuffle + sort.)
    */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame = {
    val exploded = df.select(col(idCol),
      explode(graft.expr.WordShingles.shingles(col(textCol), shingleSize)).as("__sh"))
    val aggs = (0 until numHashes).map(s =>
      min(seededHash(col("__sh"), s)).as(s"__h$s"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(s => col(s"__h$s")): _*).as("__sig"))
  }

  /** MinHash-LSH candidate pairs: band the signature, hash each band,
    * self-join on (band index, band hash). Returns (idA, idB, jaccardEst)
    * with idA < idB, deduped across bands. The band join is the scale path:
    * no O(n²) comparison; shuffle keys are the band buckets.
    */
  def minHashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame =
    bandedCandidates(
      minHashSignatures(df, idCol, textCol, shingleSize, numHashes),
      idCol, numHashes, bands, hashBandKey = true)

  /** [[minHashCandidates]] over the md5 double-hash family — the
    * oracle-parity variant: signatures from [[md5MinHashSignatures]] and
    * raw joined-signature band keys, so an engine without xxhash64 groups
    * identically. Prod stays on [[minHashCandidates]].
    */
  def md5MinHashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame =
    bandedCandidates(
      md5MinHashSignatures(df, idCol, textCol, shingleSize, numHashes),
      idCol, numHashes, bands, hashBandKey = false)

  /** Two-sided MinHash-LSH: candidate pairs BETWEEN an incoming batch and
    * an existing corpus — the incremental-ingest near-dup gate ("is this
    * crawl snapshot's page a near-copy of anything already in the
    * training set?"). Same banded shape as the self-join variants, but the
    * bucket join is batch×corpus only: no corpus self-pairs are ever
    * generated, so the dominant cost scales with the BATCH bucket sizes.
    * At steady state the corpus side's banded projection is a materialized
    * table keyed by (band, bucket) — signatures computed once per document
    * lifetime, exactly what this plan pushes down to.
    *
    * Returns (id_batch, id_corpus, jaccard_est); md5 family for oracle
    * parity, production callers swap in [[minHashSignatures]].
    */
  def md5MinHashCandidatesAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val sb = md5MinHashSignatures(batch, idCol, textCol, shingleSize, numHashes)
    val sc = md5MinHashSignatures(corpus, idCol, textCol, shingleSize, numHashes)
    val rowsPerBand = numHashes / bands
    def banded(sigs: DataFrame, side: String) = sigs.select(
      col(idCol).as(s"id_$side"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        array_join(transform(
          slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
          _.cast("string")), ",").cast("string"))))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__bucket")
    val pairs = banded(sb, "batch").join(banded(sc, "corpus"),
        Seq("__band", "__bucket"))
      .select("id_batch", "id_corpus").distinct()
    pairs
      .join(sb.select(col(idCol).as("id_batch"), col("__sig").as("__sig_a")),
        "id_batch")
      .join(sc.select(col(idCol).as("id_corpus"), col("__sig").as("__sig_b")),
        "id_corpus")
      .select(col("id_batch"), col("id_corpus"),
        (size(filter(zip_with(col("__sig_a"), col("__sig_b"), (x, y) => x === y),
          b => b)) / lit(numHashes.toDouble)).as("jaccard_est"))
  }

  private def bandedCandidates(
      sigs: DataFrame, idCol: String, numHashes: Int, bands: Int,
      hashBandKey: Boolean): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Prod hashes the band slice to a 64-bit shuffle key; the oracle-parity
    // path joins on the raw joined-signature string.
    val bandKey = (b: Column) => {
      val joined = array_join(transform(
        slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
        _.cast("string")), ",")
      if (hashBandKey) xxhash64(lit("band"), b, joined) else joined.cast("string")
    }
    // The band self-join shuffles NARROW rows — (band, bucket, id) — and the
    // per-band duplicate hits collapse to distinct (id_a, id_b) pairs before
    // any signature array moves again: the estimate depends only on the two
    // signatures (not the band), so one zip_with per distinct pair replaces
    // one per bucket collision. At scale the bucket join's fan-out is the
    // dominant row count; keeping the 8·numHashes-byte arrays out of it is
    // the difference between shuffling ids and shuffling payloads.
    val banded = sigs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bandKey)))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__bucket")

    val a = banded.select(col("__band"), col("__bucket"), col(idCol).as("id_a"))
    val b = banded.select(col("__band"), col("__bucket"), col(idCol).as("id_b"))
    val pairs = a.join(b, Seq("__band", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    pairs
      .join(sigs.select(col(idCol).as("id_a"), col("__sig").as("__sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("__sig").as("__sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("__sig_a"), col("__sig_b"), (x, y) => x === y),
          b => b)) / lit(numHashes.toDouble)).as("jaccard_est"))
  }

  /** Exact n-gram Jaccard via the sparse-join formulation: explode distinct
    * shingles, equi-join on the shingle (within an optional blocking
    * column), count matches per pair — |A∩B| — and derive
    * jaccard = c / (|A| + |B| - c). Only intersecting pairs appear (a
    * non-intersecting pair has jaccard 0), so callers threshold-filter.
    *
    * This is the scale shape: the shuffle key is the shingle, fan-out is
    * bounded by shingle document frequency, and no shingle ARRAYS ever
    * cross the wire — versus the per-pair `array_intersect` form that
    * shuffles two ~KB arrays per candidate pair and intersects them
    * interpreted (24 s → ~2 s at bench scale).
    */
  def ngramJaccardSparse(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      blockCol: Option[String] = None, maxDf: Option[Int] = None): DataFrame = {
    val keyCols = blockCol.toSeq
    // Distinct shingles built in ONE codegen'd eval per doc; the set size
    // rides through the explode, so no per-side size re-join and no second
    // or third shingle computation (the round-1 plan built the shingle
    // arrays three times: once for sizes, once per join side).
    val sh = docs.select(
      (Seq(col(idCol)) ++ keyCols.map(col) :+
        graft.expr.WordShingles.shingles(col(textCol), n, distinct = true).as("__arr")): _*)

    val exploded = maxDf match {
      case None =>
        sh.select(
          (Seq(col(idCol), size(col("__arr")).as("__n")) ++ keyCols.map(col) :+
            explode(col("__arr")).as("__sh")): _*)
      case Some(cap) =>
        // 100 TB scale knob: drop stop-shingles whose document frequency
        // (within the block) exceeds `cap` BEFORE the pair join — a
        // ubiquitous shingle fans out O(df²) candidate pairs. Jaccard is
        // then over the capped shingle universe, so sizes are recomputed
        // after the prune (mirror the same predicate in any oracle).
        val raw = sh.select(
          (Seq(col(idCol)) ++ keyCols.map(col) :+ explode(col("__arr")).as("__sh")): _*)
        val wDf = Window.partitionBy((keyCols :+ "__sh").map(col): _*)
        val wN = Window.partitionBy(col(idCol))
        raw.withColumn("__df", count(lit(1)).over(wDf))
          .filter(col("__df") <= cap)
          .withColumn("__n", count(lit(1)).over(wN))
          .drop("__df")
    }

    val a = exploded.select(
      (Seq(col(idCol).as("id_a"), col("__n").as("__na"), col("__sh")) ++ keyCols.map(col)): _*)
    val b = exploded.select(
      (Seq(col(idCol).as("id_b"), col("__n").as("__nb"), col("__sh")) ++ keyCols.map(col)): _*)
    a.join(b, Seq("__sh") ++ keyCols)
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("__c"))
      .select(col("id_a"), col("id_b"),
        (col("__c") / (col("__na") + col("__nb") - col("__c")).cast("double")).as("jaccard"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs.
    * `pairs` has (id_a, id_b); texts joined in twice. Array intersection /
    * union on distinct shingles — expression-only.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      graft.expr.WordShingles.shingles(col(textCol), n, distinct = true).as("__sh"))
    pairs
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("__sh", "__sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("__sh", "__sh_b"), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))) /
          size(array_union(col("__sh_a"), col("__sh_b"))).cast("double"))
      .select("id_a", "id_b", "jaccard")
  }

  /** 60-bit hash from the md5 hex prefix. Slower than xxhash64 but
    * reproducible in any engine that has md5 (DuckDB, Trino, pandas) —
    * used where cross-engine oracle parity matters more than speed.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SimHash over md5-derived 60-bit token hashes — the oracle-checkable
    * variant of [[simHash]]; same majority-vote construction.
    */
  def simHashMd5(c: Column): Column = {
    val toks = split(normalizeText(c), " ")
    val hashes = transform(toks, t => md5Hash60(t))
    val bits = (0 until 60).map { i =>
      val setCnt = size(filter(hashes, h => h.bitwiseAND(lit(1L << i)) =!= lit(0L)))
      when(setCnt * 2 >= size(hashes), lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** 64-bit SimHash over word tokens: sign-sum of per-token hash bits.
    * Expression-only formulation: for each bit position, count tokens whose
    * hash has the bit set vs total, set the output bit when set-count
    * exceeds half. Near-dups then group by hamming-band prefix.
    */
  def simHash(c: Column): Column = {
    val toks = split(normalizeText(c), " ")
    val hashes = transform(toks, t => xxhash64(t))
    // For bit i: popcount of tokens with bit set; majority vote.
    val bits = (0 until 64).map { i =>
      val setCnt = size(filter(hashes, h => h.bitwiseAND(lit(1L << i)) =!= lit(0L)))
      when(setCnt * 2 >= size(hashes), lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding near-dup pairs: cosine similarity above `threshold` among
    * candidate pairs bucketed by LSH random hyperplanes (see Similarity).
    * Brute-force variant for oracle-checkable correctness.
    */
  def embeddingNearDupBrute(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // Norms once per row, codegen'd dot per pair (see Similarity.dot).
    // NULL vectors dropped — same policy as every Similarity entry point.
    val nn = emb.filter(col(vecCol).isNotNull)
    // Fan out the STREAM side: the n²/2 dot products all evaluate in the
    // stream side's partitions of the nested-loop join, which on a
    // single-input-partition source is one task on one core (FanOut is
    // the identity when the input is already wide).
    val a = FanOut(nn.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      Similarity.norm(col(vecCol)).as("__na")))
    val b = nn.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      Similarity.norm(col(vecCol)).as("__nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        Similarity.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cos") > threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Connected components over an undirected edge list — the clustering
    * step of a near-dup pipeline: candidate PAIRS (from MinHash/SimHash/
    * embedding blocking) become duplicate CLUSTERS, so "keep one doc per
    * cluster" is a single keep-first over the component id.
    *
    * Algorithm: alternating large-star / small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * standard shuffle-based CC that converges in O(log² n) rounds and never
    * materializes a component on one machine. Each half-round is expressed
    * relationally (groupBy-min + equi-join), NOT via collect_list: no
    * neighbor list is ever built, so a hot node costs a shuffle-partition
    * aggregate, not an executor-memory array.
    *
    *   - large-star: every node's strictly-larger neighbors re-attach to
    *     `m(u) = min(N(u) ∪ u)`;
    *   - small-star: every node's smaller-or-equal neighbors (and the node)
    *     attach to its minimum neighbor.
    *
    * Both emit edges as (child > parent), so the working set stays
    * canonical. Convergence is the exact fixpoint test "no parent is also
    * a child" (star forest), probed with one tiny self-join per round —
    * exiting the moment the forest forms, with no confirm round. Lazy
    * `localCheckpoint` truncates lineage each round (the probe materializes
    * it in the same job), which is what keeps an iterative DataFrame
    * algorithm plannable at round 15 — a 2^15-operator lineage otherwise
    * kills the optimizer long before the cluster is the bottleneck.
    *
    * Returns (id, component): one row per node that appears in `edges`,
    * `component` = the smallest node id reachable from it. Nodes with no
    * edges are simply absent (their component is themselves — union them in
    * at the call site if needed).
    *
    * Local finish: once the working set has contracted to at most
    * `localFinishEdges` edges, the remainder runs as ONE union-find task
    * ([[localUnionFind]]) instead of more distributed rounds — the standard
    * multi-level shape (distributed contraction → local phase) that saves
    * the O(log n) tail of tiny rounds, each of which costs ~6 shuffle
    * stages regardless of data volume. The gating count() doubles as the
    * round's checkpoint materializer (the star-forest probe then reads
    * the cached edges, and is short-circuited away once the threshold is
    * reached), so the gate adds one cached-scan per round, not a
    * recompute; correctness is unaffected (union-find on the contracted graph
    * yields the same min-reachable labels, and rounds preserve both
    * connectivity and node presence). Pass `localFinishEdges = 0` to force
    * pure distributed rounds (the property specs do, to exercise them).
    */
  def connectedComponents(
      edges: DataFrame, aCol: String, bCol: String, maxIter: Int = 25,
      localFinishEdges: Long = 4L << 20): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

    // (u > v) canonical working set. Checkpoints are LAZY: the checksum
    // action right after materializes the checkpoint and computes the
    // convergence probe in the same job — one job per round, not two.
    // Null/self-loop guards run on the POST-cast values (u, v): a
    // pre-cast filter would let an uncastable id slip through as null, and
    // distinct source strings ("1", "01") that collapse under the cast
    // must be seen as the self-loop they became. try_cast, because ANSI
    // mode makes a plain cast THROW on a malformed id instead of nulling.
    def tryLong(c: String) = expr(s"try_cast(`$c` AS BIGINT)")
    var e = canon(
      edges.select(tryLong(aCol).as("u"), tryLong(bCol).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v")))
      .localCheckpoint(eager = false)

    // Exact fixpoint test: the working set is a star forest (every child
    // points directly at its root) iff no parent is itself a child — iff
    // largeStar/smallStar leave it unchanged. One tiny self-join probe per
    // round, and no wasted confirm round (a did-it-change checksum needs
    // one extra full round to observe "no change").
    def isStarForest(df: DataFrame): Boolean = df
      .select(col("v"))
      .join(df.select(col("u").as("v")), "v")
      .isEmpty

    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.unionAll(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("__mv"))
        .select(col("u"), least(col("u"), col("__mv")).as("__m"))
      // v > u ≥ m, so (v, m) is already canonical and never a self-loop.
      sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("__m").as("v"))
        .distinct()
    }

    def smallStar(cur: DataFrame): DataFrame = {
      // cur is canonical (u > v): N(u) here is exactly the ≤-neighborhood.
      val mins = cur.groupBy("u").agg(min(col("v")).as("__m"))
      val reattached = cur.join(mins, "u")
        .filter(col("v") =!= col("__m"))
        .select(col("v").as("u"), col("__m").as("v"))
      val own = mins.select(col("u"), col("__m").as("v"))
      canon(reattached.unionAll(own))
    }

    // Each count() materializes the round's lazy checkpoint (one job) and
    // is the local-finish gate; the star-forest probe only runs while the
    // graph is still too big to finish locally.
    var n = e.count()
    var converged = n <= localFinishEdges || isStarForest(e)
    var it = 0
    while (!converged && it < maxIter) {
      val prev = e
      e = smallStar(largeStar(e)).localCheckpoint(eager = false)
      n = e.count()
      // Round r's blocks are dead the moment round r+1 is materialized
      // (the count above): release them NOW instead of retaining every
      // round's working set until the GC-driven cleaner gets around to it.
      Checkpoints.release(prev)
      converged = n <= localFinishEdges || isStarForest(e)
      it += 1
    }
    if (n <= localFinishEdges) return localUnionFind(e)
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // Fixpoint is a star forest (child > root): children plus the roots.
    e.select(col("u").as("id"), col("v").as("component"))
      .unionAll(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Single-task union-find over a (u, v) BIGINT edge list — the local
    * phase of [[connectedComponents]]. One executor TASK via
    * coalesce(1).mapPartitions, not a driver collect: the edge list never
    * leaves the cluster, and the caller bounds its size with
    * `localFinishEdges`. Union-by-min (the larger root attaches under the
    * smaller) with path compression, so each set's root IS its minimum id
    * and the output is deterministic regardless of edge order.
    */
  private def localUnionFind(e: DataFrame): DataFrame = {
    val sess = e.sparkSession
    import sess.implicits._
    e.select(col("u"), col("v")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { edges =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        val nodes = scala.collection.mutable.ArrayBuffer.empty[Long]
        def find(x0: Long): Long = {
          var r = x0
          var p = parent.getOrElse(r, r)
          while (p != r) { r = p; p = parent.getOrElse(r, r) }
          var c = x0
          while (c != r) { val nx = parent(c); parent.update(c, r); c = nx }
          r
        }
        edges.foreach { case (u, v) =>
          if (!parent.contains(u)) { parent.update(u, u); nodes += u }
          if (!parent.contains(v)) { parent.update(v, v); nodes += v }
          val ru = find(u); val rv = find(v)
          if (ru != rv) {
            if (ru < rv) parent.update(rv, ru) else parent.update(ru, rv)
          }
        }
        nodes.iterator.map(id => (id, find(id)))
      }
      .toDF("id", "component")
  }

  /** Cross-document duplicate n-gram fraction — the corpus-level companion
    * to [[graft.text.Repetition]]'s within-document signals (Gopher §A1.1
    * filters on both): for each document, the fraction of its DISTINCT
    * word n-grams that also occur in at least one other document. High
    * fractions mark boilerplate/templated/mirrored text that per-document
    * exact dedup misses.
    *
    * Relational shape: distinct shingles per doc in one codegen'd eval,
    * document frequency by shingle-keyed partial aggregation, one
    * shingle-keyed join back, one id-keyed partial-agg'd reduction. The
    * shuffle key is the n-gram both times — fan-out is bounded by n-gram
    * document frequency, and with n ≥ 13-word grams df is tiny except for
    * true duplicates (the reason the curation literature uses wide grams).
    * Documents shorter than `n` tokens have no grams and drop out.
    */
  def dupNgramFraction(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(graft.expr.WordShingles.shingles(col(textCol), n, distinct = true))
        .as("__sh"))
    val dfreq = sh.groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
    sh.join(dfreq, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac", round(col("n_dup_grams") / col("n_grams"), 4))
  }

  /** Keep-best-per-cluster dedup: resolve near-dup clusters to a single
    * surviving document — the one maximizing (`qualityCol`, id) — and tag
    * every document with its cluster and verdict. This is the step that
    * turns candidate pairs + quality scores into an actual curated corpus
    * (dedup SHOULD keep the best copy, not an arbitrary one: the highest-
    * quality variant of a mirrored page is the one worth training on).
    *
    * Every document belongs to a cluster: nodes absent from `pairs` are
    * their own singleton (cluster_id = own id, keep = true). The max is a
    * lexicographic struct max — deterministic under any partitioning; ties
    * on quality resolve to the larger id.
    *
    * Scale: component ids from the large-star/small-star
    * [[connectedComponents]] (relational, no neighbor lists); the
    * representative table is one row per CLUSTER — orders of magnitude
    * smaller than the corpus — so its join back is broadcast-friendly and
    * the whole reduction is two key-partitioned shuffles.
    */
  def clusterRepresentatives(docs: DataFrame, idCol: String,
      qualityCol: String, pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    val withComp = docs.select(col(idCol), col(qualityCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), col(qualityCol),
        coalesce(col("component"), col(idCol).cast("long")).as("cluster_id"))
    val best = withComp.groupBy(col("cluster_id"))
      .agg(max(struct(col(qualityCol), col(idCol))).as("__best"))
      .select(col("cluster_id"), col(s"__best.$idCol").as("__rep"))
    withComp.join(best, "cluster_id")
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("__rep")).as("keep"))
  }
}
