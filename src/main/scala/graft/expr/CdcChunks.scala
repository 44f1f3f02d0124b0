package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Content-defined chunking (the FastCDC/gear-hash family: Xia et al.,
  * USENIX ATC 2016) over a binary column — the storage-dedup primitive
  * that makes BINARY payload dedup shift-resistant: a rolling gear hash
  * picks chunk boundaries from CONTENT, so inserting bytes near the
  * front moves one boundary instead of re-aligning every fixed-size
  * block downstream. Emits (offset, length, fnv64-of-chunk) per chunk;
  * chunk hashes then drive ordinary relational dedup (hash-keyed
  * document frequency, shared-bytes ratios) exactly like text shingles.
  *
  * One codegen'd pass per row, no state across rows; the gear table is
  * derived from a fixed splitmix64 seed, so every executor and every run
  * chunks identically. Boundaries: after `minSize` bytes, the first
  * position whose rolling hash has `avgBits` low zero bits ends the
  * chunk; `maxSize` forces a cut. Expected chunk size ≈ min + 2^avgBits.
  */
case class CdcChunks(child: Expression, minSize: Int, avgBits: Int,
    maxSize: Int) extends UnaryExpression {

  require(minSize >= 1 && maxSize >= minSize && avgBits >= 1 && avgBits <= 48,
    s"bad CDC parameters: min=$minSize avgBits=$avgBits max=$maxSize")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_chunks needs a binary column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CdcChunks.run(input.asInstanceOf[Array[Byte]], minSize, avgBits, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expr.CdcChunks$$.MODULE$$.run($in, $minSize, " +
        s"$avgBits, $maxSize);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 256-entry gear table from a fixed seed — identical everywhere. */
  private val Gear: Array[Long] =
    Array.tabulate(256)(i => splitmix64(0x67617261_66744344L + i))

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Low `bits` bits of each gear entry. With `avgBits <= bits` the cut
    * test `(h & mask) == 0` depends ONLY on the last `bits` bytes — the
    * left-shifting roll pushes older bytes past the mask — which is what
    * lets a SQL oracle replay boundaries from a position-local window
    * instead of the full sequential hash (see DedupQueries.cdcDedupSql).
    */
  def gearLow(bits: Int): IndexedSeq[Long] = {
    require(bits >= 1 && bits <= 63)
    Gear.map(_ & ((1L << bits) - 1L)).toIndexedSeq
  }

  def run(bytes: Array[Byte], minSize: Int, avgBits: Int,
      maxSize: Int): GenericArrayData = {
    val mask = (1L << avgBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize ||
        i == bytes.length - 1) {
        var fnv = FnvOffset
        var j = start
        while (j <= i) { fnv = (fnv ^ (bytes(j) & 0xff)) * FnvPrime; j += 1 }
        out += new GenericInternalRow(Array[Any](start, len, fnv))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column form: array<struct(offset, length, hash)> chunks of `c`. */
  def chunks(c: Column, minSize: Int, avgBits: Int, maxSize: Int): Column =
    GraftColumnBridge.column(
      CdcChunks(GraftColumnBridge.expression(c), minSize, avgBits, maxSize))
}
