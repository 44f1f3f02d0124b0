package graft.text

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size token
  * chunks with overlap — the step that turns a curated corpus into
  * training examples (the dual of shard packing, which concatenates).
  *
  * Map-only: tokenize once, compute the chunk count arithmetically
  * (integer-exact math — no float ceil ambiguity, so any engine agrees),
  * explode a 0..nChunks-1 range, slice the token array per chunk. The
  * explode fan-out is ~n/stride per document; no shuffle at all unless
  * the caller aggregates downstream. At 100 TB this is embarrassingly
  * parallel and whole-stage-codegen'd end to end.
  */
object Chunker {

  /** One row per (doc, chunk): `chunk_id`, `n_tokens` (in the chunk),
    * `chunk_text`. Chunks start every `stride = chunkSize - overlap`
    * tokens; the last chunk is the first one whose window reaches the
    * final token (shorter than `chunkSize` when truncated). Documents
    * with at most `chunkSize` tokens yield exactly one chunk.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = split(Dedup.normalizeText(col(textCol)), " ")
    // nChunks = 1 + ceil((n - chunkSize) / stride) for n > chunkSize.
    // floor((n - overlap - 1) / stride) + 1 is the same value in exact
    // integer arithmetic (int-valued doubles divide exactly below 2^53).
    val base = docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__nc", when(col("__n") <= chunkSize, lit(1))
        .otherwise(floor((col("__n") - lit(overlap + 1)) / lit(stride))
          .cast("int") + 1))
    base
      .withColumn("chunk_id", explode(sequence(lit(0), col("__nc") - 1)))
      // Bind the slice once: n_tokens from the same array the text joins,
      // not a second copy per output row.
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize)))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
