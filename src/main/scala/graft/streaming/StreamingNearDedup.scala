package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming NEAR-duplicate filter: MinHash-LSH dedup of a document
  * stream against everything seen so far, with bounded state — the
  * continuous-ingest twin of the batch [[graft.ops.Dedup.minHashCandidates]]
  * pipeline (and the missing piece between it and
  * [[StreamingIngest.streamingContentDedup]], which only catches EXACT
  * content).
  *
  * Shape: per micro-batch, each document's MinHash signature is computed
  * with the same seeded-hash family as the batch path, banded, and
  * exploded to one row per band bucket. `flatMapGroupsWithState` keyed by
  * (band, bucket-hash) then holds the bucket's first-seen signatures as
  * custom state: a new document whose signature agrees with a stored one
  * on ≥ `tau` of positions is emitted as a duplicate flag. LSH does the
  * candidate pruning exactly as in batch — only same-bucket pairs are
  * ever compared, so per-group work tracks true near-dup density, not n².
  *
  * State discipline (the part that must hold on an unbounded stream):
  *   - state lives per OCCUPIED bucket, each capped at `maxPerBucket`
  *     signatures (beyond the cap, new non-dup docs pass through
  *     unflagged rather than growing state — a recall-for-memory trade.
  *     Cap pressure is observable on SUBSEQUENT duplicate flags (their
  *     `bucket_capped` field is true); a capped pass-through of a
  *     non-duplicate emits nothing, so cap-induced recall loss in a
  *     bucket only surfaces once a later doc flags against its stored
  *     originals. Size `maxPerBucket` to the expected bucket occupancy
  *     rather than relying on the flag as an early-warning signal;
  *   - an event-time timeout clears buckets idle past the stream's
  *     watermark + `stateTtl`, so abandoned buckets cannot accumulate
  *     forever. A duplicate arriving after its bucket expired is NOT
  *     flagged — the retention window is the dedup horizon, exactly like
  *     `dropDuplicatesWithinWatermark`'s contract for exact keys.
  *
  * Output: one row per (document, matched bucket) flag — `(doc_id, ts,
  * dup_of, sim_est, bucket_capped)`. A document can collide with prior
  * docs in several bands; downstream consumes `flags.groupBy(doc_id)`
  * or an anti-join of the id set, both plain batch ops on the sink
  * table. Emitting flags (not the filtered stream) keeps the operator
  * append-only and retraction-free.
  *
  * Batch-parity caveat, stated rather than hidden: "first-seen" is
  * micro-batch arrival order (ties within a batch are broken by (ts,
  * doc_id)), and similarity is the SIGNATURE estimate (matching MinHash
  * positions / numHashes), the same estimator the batch LSH candidates
  * report before exact verification. A stream cannot re-read earlier
  * documents' shingle sets without unbounded storage, so exact-Jaccard
  * verification belongs downstream where the corpus is at rest.
  */
object StreamingNearDedup {

  case class BandedDoc(
      bucket: Long, doc_id: Long, ts: Timestamp, sig: Seq[Long])

  case class BucketState(
      // First-seen order; capped at maxPerBucket.
      docIds: List[Long],
      sigs: List[Seq[Long]],
      lastSeenMs: Long)

  case class DupFlag(
      doc_id: Long,
      ts: Timestamp,
      dup_of: Long,
      sim_est: Double,
      bucket_capped: Boolean)

  /** `docs` must carry (idCol: long, textCol: string, tsCol: timestamp).
    * A watermark is applied here; `numHashes` must divide into `bands`
    * evenly (rows per band = numHashes / bands).
    */
  def flags(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      tau: Double = 0.7,
      maxPerBucket: Int = 64,
      watermarkDelay: String = "10 minutes",
      stateTtlMs: Long = 60 * 60 * 1000L): Dataset[DupFlag] = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    // Construction-time guards for parameters that would otherwise fail
    // silently or mid-flight: maxPerBucket <= 0 stores no state at all
    // (the operator never flags anything, without error), and
    // stateTtlMs <= 0 sets a timeout at/behind the current watermark —
    // an IllegalArgumentException inside the RUNNING streaming query.
    require(maxPerBucket > 0, s"maxPerBucket must be positive, got $maxPerBucket")
    require(stateTtlMs > 0, s"stateTtlMs must be positive, got $stateTtlMs")
    val rowsPerBand = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._

    // Same signature family as the batch path (Dedup.minHashSignature's
    // seeded xxhash64 over distinct word shingles), computed per row in
    // one pass — no shuffle before the stateful operator itself.
    val sig = Dedup.minHashSignature(
      graft.expr.WordShingles.shingles(col(textCol), shingleSize,
        distinct = true), numHashes)
    val banded = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("__ts"), sig.as("__sig"))
      .select(col("doc_id"), col("__ts"), col("__sig"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand)))
          : _*)).as(Seq("__band", "__bh")))
      .select(
        // Band index folds into the key so distinct bands never share a
        // state group even on a 64-bit hash collision.
        xxhash64(col("__band"), col("__bh")).as("bucket"),
        col("doc_id"),
        // The WATERMARKED column itself must flow into the grouped
        // dataset (a typed .map would mint fresh attributes and strip
        // the watermark tag the event-time timeout requires).
        col("__ts").as("ts"),
        col("__sig").as("sig"))
      .as[BandedDoc]

    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(tau, maxPerBucket, stateTtlMs))
  }

  private def simEst(a: Seq[Long], b: Seq[Long]): Double = {
    var same = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / math.max(a.length, b.length)
  }

  private def update(tau: Double, cap: Int, ttlMs: Long)(
      bucket: Long,
      docs: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[DupFlag] = {
    if (state.hasTimedOut) {
      // Bucket idle past watermark + TTL: drop its signatures. A later
      // near-dup of an expired doc is simply out of the dedup horizon.
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(BucketState(Nil, Nil, 0L))
    val out = Seq.newBuilder[DupFlag]
    // Micro-batch arrival within a group is unordered; pin first-seen to
    // (ts, doc_id) so reruns of the same batch flag identically.
    docs.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
      val tsMs = d.ts.getTime
      // Compare against stored signatures, first-seen first: the flag
      // points at the OLDEST qualifying original, matching the batch
      // keep-first convention.
      val hit = st.docIds.zip(st.sigs).collectFirst {
        case (id, s) if id != d.doc_id && simEst(s, d.sig) >= tau =>
          (id, simEst(s, d.sig))
      }
      val capped = st.docIds.sizeIs >= cap
      hit match {
        case Some((origId, est)) =>
          out += DupFlag(d.doc_id, d.ts, origId, est, capped)
        // A REDELIVERED id (at-least-once transports retry) must not
        // append again: without this check a retry storm fills the cap
        // with copies of one document and the bucket silently stops
        // detecting anything new. Re-seeing an id is a state no-op (it
        // is already the bucket's first-seen entry for its content).
        case None if st.docIds.contains(d.doc_id) => ()
        case None if !capped =>
          // Append preserving first-seen order (lists prepend; keep
          // appended order by rebuilding — bucket lists are cap-bounded,
          // so the rebuild is O(cap)).
          st = BucketState(st.docIds :+ d.doc_id, st.sigs :+ d.sig,
            math.max(st.lastSeenMs, tsMs))
        case None => // capped bucket: pass through unflagged, state fixed
      }
      st = st.copy(lastSeenMs = math.max(st.lastSeenMs, tsMs))
    }
    if (st.docIds.nonEmpty) {
      state.update(st)
      state.setTimeoutTimestamp(st.lastSeenMs + ttlMs)
    }
    out.result().iterator
  }
}
