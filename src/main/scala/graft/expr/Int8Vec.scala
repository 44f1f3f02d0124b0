package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Packed int8 vector codecs — the STORAGE form of
  * [[graft.ops.Similarity.quantizeInt8]]'s code arrays: one signed byte
  * per component in a BinaryType column. `array<int>` spends ~16 bytes
  * per element inside Tungsten rows and parquet; packed bytes spend 1.
  * At 100 TB of embeddings that factor is the difference between a
  * shuffle that fits and one that doesn't, so the pack/dot pair is
  * codegen'd (tight primitive loops over the byte[] — no per-element
  * boxing, no interpreted higher-order functions).
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  // Nullable also when the array itself is non-null but CONTAINS nulls:
  // a null element nulls the whole packed vector (see run()).
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_int8 needs array<int> codes in [-128, 127], got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PackInt8.run(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // ev.isNull is only a real variable when nullable; with
      // containsNull=false input run() cannot return null and ev.isNull
      // is the `false` literal, which must not be assigned to.
      val markNull =
        if (nullable) s"${ev.isNull} = ${ev.value} == null;" else ""
      s"""
         |${ev.value} = graft.expr.PackInt8$$.MODULE$$.run($a);
         |$markNull
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)
}

object PackInt8 {
  def run(codes: ArrayData): Array[Byte] = {
    val n = codes.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // A null code component nulls the WHOLE packed vector — packing it
      // as 0 would be indistinguishable from a real zero code and turn a
      // corrupt-input data bug into a plausible-looking similarity
      // downstream. This matches the interpreted zip_with+aggregate
      // contract dotQuantized had before the codegen'd form: any null
      // element nulled the dot.
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      require(c >= -128 && c <= 127, s"int8 code out of range: $c")
      out(i) = c.toByte
      i += 1
    }
    out
  }
}

/** Exact integer dot product over two packed int8 code vectors: a long
  * accumulator over byte products — order-free (integer addition
  * associates), so unlike a float dot the result is identical under ANY
  * partitioning, vectorization or engine. A LENGTH MISMATCH nulls the
  * result rather than dotting the common prefix — two code vectors of
  * different dims are schema drift, and a plausible-looking prefix
  * similarity is exactly the corrupt-input laundering [[PackInt8]]'s
  * null-element contract exists to prevent.
  */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_dot needs two binary code columns, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length) return null
    var acc = 0L
    var i = 0
    while (i < a.length) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += (long) $a[$i] * (long) $b[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object Int8Vec {
  def packInt8(codes: Column): Column =
    GraftColumnBridge.column(PackInt8(GraftColumnBridge.expression(codes)))

  def int8Dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(Int8Dot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
