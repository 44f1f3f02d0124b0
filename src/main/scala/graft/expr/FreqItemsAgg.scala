package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a typed partial aggregate — the
  * deterministic heavy-hitters sketch (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * State is at most `k - 1` (item, counter) pairs, O(k) memory regardless
  * of input size. Deterministic guarantees over n input rows:
  *
  *   - every item with true count > n/k IS in the summary;
  *   - estimates never overcount, and undercount by at most n/k.
  *
  * update: increment a present item; insert if a slot is free; otherwise
  * decrement every counter (dropping zeros) — the classic k-way cancel.
  * merge: sum counters pairwise, then keep the top k-1 by subtracting the
  * k-th largest count (the PODS'12 merge that preserves the error bound) —
  * so map-side partials combine exactly and the shuffle carries O(k) per
  * group, never the item universe. That is the 100 TB contrast with exact
  * `groupBy(item).count()`: the sketch answers "what are the heavy
  * tokens?" with one narrow aggregate, no item-keyed shuffle at all.
  *
  * eval emits the summary sorted (estimate desc, item asc): an array of
  * (item, est) structs.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, "k must be at least 2")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c(0))
  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k - 1 => buf.update(item, 1L)
        case None =>
          // Decrement-all: cancels one occurrence of k distinct items.
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (i, c) => if (c == 1L) dead += i else buf.update(i, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (i, c) => buf.update(i, buf.getOrElse(i, 0L) + c) }
    if (buf.size > k - 1) {
      // Subtract the k-th largest counter and keep strictly positive ones:
      // at most k-1 survive, error grows by exactly the subtracted amount.
      val kth = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (i, c) =>
        if (c - kth <= 0) dead += i else buf.update(i, c - kth)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c) =>
      val row = new GenericInternalRow(2)
      row.update(0, UTF8String.fromString(i))
      row.update(1, c)
      row
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val bytes = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }
}

object FreqItemsAgg {
  /** Column API: `freqItems(col("token"), 100)` → array<struct<item,est>>. */
  def freqItems(c: Column, k: Int): Column = {
    val agg = FreqItemsAgg(GraftColumnBridge.expression(c), k)
    GraftColumnBridge.column(agg.toAggregateExpression())
  }
}
