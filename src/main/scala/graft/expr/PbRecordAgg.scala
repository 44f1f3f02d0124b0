package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass personal-best record reduction
  * (`/root/reference/src/3_transform_data.py:612-694`), as a typed partial
  * aggregate. Replaces the window formulation's shuffle-then-sort (min over
  * task + row_number + min-timestamp, then a groupBy) for step 4 of
  * [[graft.reports.PersonalBests]]:
  *
  *   - per task, the definitive record is the first kept row in
  *     (ts asc, historical first, config order, raw id) order;
  *   - kept = rows whose seconds lie within `thresholdSec` of the task
  *     minimum (everything when the minimum is the historical "0:00" → ∞
  *     sentinel — `kept` in PersonalBests.generate);
  *   - achievers = kept rows within `windowSec` of the earliest kept row;
  *     holders = first historical achiever's holder list + DB achievers +
  *     (when allowed) later holders.
  *
  * The aggregation state holds only rows still within the threshold band of
  * the *current* partial minimum — pruning is monotone (a row outside the
  * band of a partial min is outside the band of the final, smaller min), so
  * partial (map-side) aggregation is exact. State is O(band), i.e. the ties
  * for the record, not the task's full history: the shuffle carries
  * candidate sets, not every broadcast row, and no per-task sort ever runs.
  * Null-seconds rows (unparseable PB_Time) survive only when the final
  * minimum is ∞, matching the window form's `min_sec === ∞` escape; a task
  * with no parseable time at all evaluates to null (the window form drops
  * such rows pre-groupBy), so callers filter null results.
  *
  * Emits a struct: (time, date, hist_holders, db_holders, later_holders) —
  * the same five intermediates the window form feeds the holder merge.
  */
case class PbRecordAgg(
    sec: Expression,
    ts: Expression,
    isHist: Expression,
    cfg: Expression,
    rawId: Expression,
    pbTime: Expression,
    dateStr: Expression,
    username: Expression,
    holders: Expression,
    thresholdSec: Double,
    windowSec: Long,
    allowMultiple: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PbRecordAgg.Buffer] {

  import PbRecordAgg._

  override def children: Seq[Expression] =
    Seq(sec, ts, isHist, cfg, rawId, pbTime, dateStr, username, holders)

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PbRecordAgg =
    copy(sec = c(0), ts = c(1), isHist = c(2), cfg = c(3), rawId = c(4),
      pbTime = c(5), dateStr = c(6), username = c(7), holders = c(8))

  override def withNewMutableAggBufferOffset(offset: Int): PbRecordAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): PbRecordAgg =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("time", StringType),
    StructField("date", StringType),
    StructField("hist_holders", ArrayType(StringType)),
    StructField("db_holders", ArrayType(StringType)),
    StructField("later_holders", ArrayType(StringType))))

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val secV = sec.eval(input)
    val tsV = ts.eval(input)
    if (tsV == null) return buf // no event time → unordered; window form has none either
    val cand = Cand(
      hasSec = secV != null,
      sec = if (secV == null) 0.0 else secV.asInstanceOf[Double],
      ts = tsV.asInstanceOf[Long],
      isHist = isHist.eval(input).asInstanceOf[Boolean],
      cfg = asOptLong(cfg.eval(input)),
      rawId = asOptLong(rawId.eval(input)),
      pbTime = asStr(pbTime.eval(input)),
      dateStr = asStr(dateStr.eval(input)),
      username = asStr(username.eval(input)),
      holders = asStrArray(holders.eval(input)))
    buf.add(cand, thresholdSec)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    buf.mergeFrom(other, thresholdSec)
    buf
  }

  override def eval(buf: Buffer): Any = {
    val kept = buf.keptFinal(thresholdSec)
    if (kept.isEmpty) return null
    val sorted = kept.sortBy(c =>
      (c.ts, if (c.isHist) 0 else 1,
        c.cfg.getOrElse(Long.MaxValue), c.rawId.getOrElse(Long.MaxValue)))
    val rn1 = sorted.head
    val cutoff = sorted.head.ts + windowSec * 1000000L // event time is µs
    val histHolders = sorted
      .find(c => c.isHist && c.ts <= cutoff)
      .map(_.holders).orNull
    val db = sorted.iterator
      .filter(c => !c.isHist && c.ts <= cutoff && c.username != null)
      .map(_.username).toArray
    val later =
      if (allowMultiple) sorted.iterator
        .filter(c => c.ts > cutoff && c.username != null)
        .map(_.username).toArray
      else Array.empty[String]
    new GenericInternalRow(Array[Any](
      utf8(rn1.pbTime), utf8(rn1.dateStr),
      if (histHolders == null) null else strArray(histHolders),
      strArray(db), strArray(later)))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.minSeen)
    out.writeDouble(buf.minSec)
    out.writeInt(buf.cands.length)
    buf.cands.foreach { c =>
      out.writeBoolean(c.hasSec); out.writeDouble(c.sec); out.writeLong(c.ts)
      out.writeBoolean(c.isHist)
      writeOptLong(out, c.cfg); writeOptLong(out, c.rawId)
      writeStr(out, c.pbTime); writeStr(out, c.dateStr); writeStr(out, c.username)
      if (c.holders == null) out.writeInt(-1)
      else { out.writeInt(c.holders.length); c.holders.foreach(writeStr(out, _)) }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buffer
    buf.minSeen = in.readBoolean()
    buf.minSec = in.readDouble()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val hasSec = in.readBoolean(); val s = in.readDouble(); val t = in.readLong()
      val h = in.readBoolean()
      val cfgV = readOptLong(in); val rawV = readOptLong(in)
      val pt = readStr(in); val ds = readStr(in); val un = readStr(in)
      val hn = in.readInt()
      val hs = if (hn < 0) null else Array.fill(hn)(readStr(in))
      buf.cands += Cand(hasSec, s, t, h, cfgV, rawV, pt, ds, un, hs)
      i += 1
    }
    buf
  }

  override def prettyName: String = "pb_record_agg"
}

object PbRecordAgg {

  final case class Cand(
      hasSec: Boolean, sec: Double, ts: Long, isHist: Boolean,
      cfg: Option[Long], rawId: Option[Long],
      pbTime: String, dateStr: String, username: String, holders: Array[String])

  /** Partial state: running min of seconds plus the candidates still inside
    * the threshold band of that min.
    */
  final class Buffer {
    var minSeen = false
    var minSec = Double.PositiveInfinity
    val cands = new ArrayBuffer[Cand]

    private def inBand(c: Cand, thr: Double): Boolean =
      if (!minSeen || minSec.isPosInfinity) true
      else c.hasSec && math.abs(c.sec - minSec) <= thr

    def add(c: Cand, thr: Double): Unit = {
      if (c.hasSec && (!minSeen || c.sec < minSec)) {
        minSeen = true
        minSec = c.sec
        // tighter min → some retained candidates may have left the band
        val keep = cands.filter(inBand(_, thr))
        cands.clear(); cands ++= keep
      }
      if (inBand(c, thr)) cands += c
    }

    def mergeFrom(other: Buffer, thr: Double): Unit = {
      if (other.minSeen && (!minSeen || other.minSec < minSec)) {
        minSeen = true
        minSec = other.minSec
        val keep = cands.filter(inBand(_, thr))
        cands.clear(); cands ++= keep
      }
      other.cands.foreach(c => if (inBand(c, thr)) cands += c)
    }

    def keptFinal(thr: Double): ArrayBuffer[Cand] =
      if (!minSeen) ArrayBuffer.empty else cands.filter(inBand(_, thr))
  }

  private def asOptLong(v: Any): Option[Long] =
    if (v == null) None else Some(v.asInstanceOf[Long])
  private def asStr(v: Any): String =
    if (v == null) null else v.toString
  private def asStrArray(v: Any): Array[String] =
    if (v == null) null
    else v.asInstanceOf[ArrayData].toArray[UTF8String](StringType)
      .map(s => if (s == null) null else s.toString)

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)
  private def strArray(a: Array[String]): GenericArrayData =
    new GenericArrayData(a.map(utf8).asInstanceOf[Array[Any]])

  private def writeOptLong(out: DataOutputStream, v: Option[Long]): Unit = {
    out.writeBoolean(v.isDefined); out.writeLong(v.getOrElse(0L))
  }
  private def readOptLong(in: DataInputStream): Option[Long] = {
    val has = in.readBoolean(); val v = in.readLong()
    if (has) Some(v) else None
  }
  // Length-prefixed UTF-8, not writeUTF: writeUTF throws
  // UTFDataFormatException past 64 KB of encoded bytes, which would kill the
  // aggregation at shuffle time on pathological usernames/holder strings.
  private def writeStr(out: DataOutputStream, s: String): Unit =
    if (s == null) out.writeBoolean(false)
    else {
      out.writeBoolean(true)
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes)
    }
  private def readStr(in: DataInputStream): String =
    if (!in.readBoolean()) null
    else {
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }
}
