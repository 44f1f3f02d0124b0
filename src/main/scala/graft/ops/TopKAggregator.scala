package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed top-k aggregator: keeps the k best (score desc, id asc) pairs in a
  * bounded buffer.
  *
  * Versus the `row_number().over(Window.partitionBy(query))` formulation,
  * this aggregates PARTIALLY on the map side — each input partition reduces
  * its candidates to k rows before the shuffle, so the exchange moves
  * O(partitions × k) rows instead of every candidate pair. That is the
  * difference that matters when the candidate set is |probes| × |corpus|.
  *
  * Buffer is a plain sorted Seq (k is small); `Encoders.product` keeps it
  * Catalyst-serializable between partial and final aggregation.
  */
case class ScoredId(id: Long, score: Double)
case class TopKBuffer(items: Seq[ScoredId])

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, TopKBuffer, Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(items: Seq[ScoredId]): Seq[ScoredId] =
    items.sortWith(better).take(k)

  override def zero: TopKBuffer = TopKBuffer(Seq.empty)

  override def reduce(buf: TopKBuffer, in: ScoredId): TopKBuffer =
    // Fast reject when the buffer is full and the candidate can't place.
    if (buf.items.size >= k && better(buf.items.last, in)) buf
    else TopKBuffer(trim(buf.items :+ in))

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
    TopKBuffer(trim(a.items ++ b.items))

  override def finish(buf: TopKBuffer): Seq[ScoredId] = buf.items

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[ScoredId]] = {
    implicit val e: Encoder[ScoredId] = Encoders.product[ScoredId]
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }
}

object TopKAggregator {
  /** Column form: `top_k(id, score)` → array<struct<id, score>> (the
    * product input encoder flattens ScoredId into two arguments).
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId])

  def apply(k: Int, id: Column, score: Column): Column = topK(k)(id, score)
}
