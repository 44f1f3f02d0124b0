package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document compression-ratio signal: (utf8_bytes, deflate_bytes)
  * from one DEFLATE pass at a fixed level — the classic redundancy screen
  * web-corpus curation runs alongside the repetition heuristics
  * (machine-generated/boilerplate text compresses far below prose; a
  * near-1.0 ratio flags binary-ish noise). Emitting both byte counts
  * keeps the row integer-exact; divide downstream for the ratio.
  *
  * One codegen'd call per row (same shape as [[TextStats]]): the
  * expression stays inside whole-stage codegen and the DEFLATE runs over
  * the row's UTF-8 bytes without materializing an intermediate copy of
  * the corpus anywhere. Level is pinned so the signal is stable across
  * runs; the byte count (not the compressed bytes) is emitted, so output
  * rows are a fixed 16 bytes regardless of document size.
  */
case class CompressStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("utf8_bytes", LongType, nullable = false),
    StructField("deflate_bytes", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"compress_stats needs a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CompressStats.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expr.CompressStats$$.MODULE$$.run($in);")

  override protected def withNewChildInternal(newChild: Expression): CompressStats =
    copy(child = newChild)
}

object CompressStats {

  /** Pinned DEFLATE parameters: default level, raw zlib wrapper. */
  private val Level = 6

  // One native zlib stream per executor thread, reset() between rows —
  // allocating/ending a Deflater per row would pay native stream
  // setup/teardown on every document of the corpus scan. The thread pool
  // bounds the stream count; streams live for the executor's lifetime.
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(Level, false)
  }

  def run(s: UTF8String): GenericInternalRow = {
    val bytes = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    new GenericInternalRow(Array[Any](bytes.length.toLong, total))
  }

  /** Column form: `compressStats(text)` → struct(utf8_bytes, deflate_bytes). */
  def stats(c: Column): Column =
    GraftColumnBridge.column(CompressStats(GraftColumnBridge.expression(c)))
}
