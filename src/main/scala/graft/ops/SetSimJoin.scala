package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with PREFIX FILTERING (AllPairs —
  * Bayardo et al., WWW'07; PPJoin — Xiao et al., ICDE'08): all document
  * pairs whose shingle-set Jaccard clears a threshold, WITHOUT the O(n²)
  * cross join and without LSH's false negatives. The pruning is
  * lossless: under any global token order, two sets with Jaccard ≥ τ
  * must share a token inside both PREFIXES (the first |x| − ⌈τ·|x|⌉ + 1
  * tokens of each sorted set) — so joining exploded prefixes finds every
  * qualifying pair, and candidates are verified with the exact Jaccard.
  * The two ceil()s carry a −1e-9 guard so float jitter can only LENGTHEN
  * a prefix / RELAX the length filter, never break losslessness.
  *
  * The global order is rarest-first (ascending document frequency, token
  * as tie-break): rare tokens make poor join keys for false candidates,
  * which is exactly what puts them in prefixes. At 100 TB the shape is
  * three key-partitioned shuffles (distinct grams → df join → per-doc
  * sort) plus a gram-keyed candidate join whose fan-out is the point:
  * prefixes are ~(1−τ) of each set, and only rare grams appear in them,
  * so candidate volume tracks true-pair volume, not n². Verification
  * joins candidate ids back to the doc→gram-array map (doc-keyed) and
  * intersects arrays per pair — no second explode.
  */
object SetSimJoin {

  /** Candidate (id_a, id_b, sz_a, sz_b) pairs from prefix intersection +
    * the Jaccard length filter min ≥ τ·max. Superset of the true result.
    */
  def candidatePairs(ranked: DataFrame, tau: Double): DataFrame = {
    val prefix = ranked.select(col("id"), col("sz"),
      posexplode(slice(col("grams"), lit(1),
        (col("sz") - ceil(col("sz") * lit(tau) - lit(1e-9)) + lit(1)).cast("int")))
        .as(Seq("pos", "gram")))
    val a = prefix.select(col("id").as("id_a"), col("sz").as("sz_a"),
      col("pos").as("__pa"), col("gram"))
    val b = prefix.select(col("id").as("id_b"), col("sz").as("sz_b"),
      col("pos").as("__pb"), col("gram"))
    // PPJoin position filter (lossless): prefixes hold each set's
    // lowest-global-order tokens, so the smallest COMMON token w0 of a
    // qualifying pair sits in both prefixes at positions (min pa, min
    // pb); every common token orders ≥ w0, hence the overlap fits in the
    // tails: |x∩y| ≤ min(sz_a − pa*, sz_b − pb*). Jaccard ≥ τ needs
    // overlap ≥ τ/(1+τ)·(sz_a+sz_b); prune pairs whose bound can't reach
    // it. The groupBy replaces the distinct — same shuffle, plus the agg
    // that powers the prune.
    //
    // ACCUMULATED-overlap refinement (PPJoin's running-α bound, applied
    // at the last common prefix token w* instead of the first): let
    // cp = |prefix(x) ∩ prefix(y)| and (ma, mb) = w*'s positions. The
    // arrays are sorted by the SAME global order, so any common token
    // below w* sits before (ma, mb) in BOTH arrays — hence inside both
    // prefixes, hence already counted in cp — and any common token above
    // w* sits after ma in x AND after mb in y. So
    // |x∩y| ≤ cp + min(sz_a − ma − 1, sz_b − mb − 1), a bound that
    // tightens with every shared prefix token, where the first-token
    // bound only knew "overlap fits in the tails". On a small-vocabulary
    // corpus (huge true-pair volume, long shared prefixes) this is the
    // filter that actually bites: the verify join replicates each
    // document's gram array once per surviving candidate, so candidates
    // pruned here are shuffle bytes never shipped.
    val oMin = (col("sz_a") + col("sz_b")) * lit(tau / (1.0 + tau)) - lit(1e-9)
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")) >=
          ceil(greatest(col("sz_a"), col("sz_b")) * lit(tau) - lit(1e-9)))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(min(col("__pa")).as("__pa"), min(col("__pb")).as("__pb"),
        max(col("__pa")).as("__ma"), max(col("__pb")).as("__mb"),
        count(lit(1)).as("__cp"))
      .filter(
        least(col("sz_a") - col("__pa"), col("sz_b") - col("__pb"))
          .cast("double") >= oMin &&
        (col("__cp") +
          least(col("sz_a") - col("__ma"), col("sz_b") - col("__mb")) -
          lit(1)).cast("double") >= oMin)
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
  }

  /** Rarest-first-sorted distinct gram arrays per document:
    * (id, grams, sz). Documents with no grams (shorter than the shingle
    * window) are absent.
    */
  def rankedSets(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame = {
    // Grams travel as md5-60 longs, not strings: an 8-byte join/shuffle
    // payload instead of ~26 and long-array intersections at verify
    // time. The canonical order becomes (df, hash) — still total, so
    // prefix filtering stays lossless — and Jaccard counts are unchanged
    // barring 60-bit collisions inside one pair's union (~2^-51 per
    // pair; deterministic either way).
    val sets = docs.select(col(idCol).as("id"),
        explode(graft.expr.WordShingles.shingles(col(textCol), shingleSize,
          distinct = true)).as("__g"))
      .select(col("id"), Dedup.md5Hash60(col("__g")).as("gram"))
    // Document frequency as a whole-partition window count over gram
    // instead of groupBy + join-back: the same (id, gram, __df) rows
    // from ONE gram-keyed exchange, where the join form scanned `sets`
    // twice (once per leg), built a distinct-grams aggregate, and
    // broadcast it — a structure that stops working the moment the
    // distinct-gram table outgrows the broadcast cap, while the window
    // is gram-partitioned (high-cardinality key, no single-partition
    // collapse) at any scale (guide §2.4).
    import org.apache.spark.sql.expressions.Window
    sets
      .withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("gram"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("__df"), col("gram")))),
        x => x.getField("gram")).as("grams"))
      .withColumn("sz", size(col("grams")))
  }

  /** Exact-Jaccard self-join: (id_a, id_b, jaccard) with jaccard ≥ tau,
    * id_a < id_b. Equal to the naive all-pairs computation.
    */
  def selfJoin(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    // Referenced three times below (prefix explode + both verify joins);
    // without reuse each branch would re-run the whole shingle→df→sort
    // pipeline — at any scale that triples the dominant cost. Persisted
    // SERIALIZED (memory-then-disk), not localCheckpoint'd: this frame is
    // DATA-SIZED (every doc's full gram array), and holding it
    // deserialized in executor heap was the r13 100× rehearsal's GC
    // wall — ratio 22 at the second decade on an 8 GB heap, collapsing
    // to sub-linear once the reuse stopped competing with the posting
    // shuffle for memory ("checkpoint model-sized state; data-sized reuse
    // is serialized and spill-able, never deserialized-resident").
    val ranked = rankedSets(docs, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // Materialize the cache BEFORE the three consumers reference it:
    // under AQE the prefix-explode leg and both verify legs plan their
    // leaf stages concurrently, and a still-cold cache makes each of
    // them execute the full shingle→df→sort pipeline (measured at
    // sf0.1: the documents scan ran 6× across racing stages, one of
    // them inside a broadcast-build thread). One count() builds the
    // cache once, sequentially; every branch then scans stored batches
    // (guide §1.2 step 1 — don't compute things you throw away).
    ranked.count()
    val cands = candidatePairs(ranked, tau)
    val arrs = ranked.select(col("id"), col("grams"))
    // (A tail-only verification — __cp + intersect of the post-w* slices,
    // lossless by the same monotonicity argument as the accumulated
    // filter — was measured here and came out flat-to-slower: slice()
    // materializes array copies that cost what the shorter intersect
    // saves, and the dominant cost of this operator at low τ is the
    // posting-list co-occurrence shuffle inside candidatePairs, not the
    // verify. Full-array intersect kept for simplicity.)
    val inter = size(array_intersect(col("__ga"), col("__gb")))
    cands
      .join(arrs.select(col("id").as("id_a"), col("grams").as("__ga")), Seq("id_a"))
      .join(arrs.select(col("id").as("id_b"), col("grams").as("__gb")), Seq("id_b"))
      .withColumn("jaccard",
        inter.cast("double") / (col("sz_a") + col("sz_b") - inter))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
