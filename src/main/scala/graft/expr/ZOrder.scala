package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (z-order) bit-interleave of N integral columns into one long
  * sort key — the multi-dimensional clustering primitive behind
  * data-skipping layouts: sort/range-partition a 100 TB table by
  * `z_order(a, b)` and parquet min/max footers become tight in BOTH
  * dimensions, so selective filters on either column prune row groups —
  * a single-column sort only ever prunes its own column.
  *
  * Bit j of dimension d lands at output bit `j * N + d`: each dimension
  * contributes `bitsPerDim` low bits (values are interpreted as unsigned
  * in `[0, 2^bitsPerDim)`; callers with negative or wider domains shift/
  * quantize first — locality is only meaningful on a bounded domain).
  * `N * bitsPerDim` must fit the 63 non-sign bits so the key orders
  * correctly as a signed long.
  *
  * Codegen emits a tight unrolled-per-child bit loop; interpreted eval
  * mirrors it exactly.
  */
case class ZOrder(children: Seq[Expression], bitsPerDim: Int) extends Expression {

  require(children.nonEmpty, "z_order needs at least one column")
  require(bitsPerDim > 0 && children.size * bitsPerDim <= 63,
    s"${children.size} dims x $bitsPerDim bits must fit in 63 bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"z_order needs integral columns, got $bad")
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    var out = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Number].longValue()
      var i = 0
      while (i < bitsPerDim) {
        out |= ((x >>> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val childCodes = evals.zipWithIndex.map { case (e, j) =>
      val v = ctx.freshName("zv")
      val i = ctx.freshName("zi")
      s"""
         |${e.code}
         |if (!${ev.isNull}) {
         |  if (${e.isNull}) {
         |    ${ev.isNull} = true;
         |    ${ev.value} = 0L;
         |  } else {
         |    long $v = (long) ${e.value};
         |    for (int $i = 0; $i < $bitsPerDim; $i++) {
         |      ${ev.value} |= (($v >>> $i) & 1L) << ($i * $n + $j);
         |    }
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |$childCodes
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrder = copy(children = newChildren)
}

object ZOrder {
  /** Column API: `zOrder(Seq(col("a"), col("b")), 16)`. */
  def zOrder(cols: Seq[Column], bitsPerDim: Int): Column =
    GraftColumnBridge.column(
      ZOrder(cols.map(GraftColumnBridge.expression), bitsPerDim))
}
