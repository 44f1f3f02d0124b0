package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns.
  *
  * The `functions.aggregate(zip_with(...))` formulation is semantically
  * right but executes the lambda per element through the interpreted
  * higher-order-function path — at 2M candidate pairs × 64 dims that was
  * the single hottest spot in the whole bench (~50 s at sf0.1). This
  * expression generates a tight primitive loop instead (`getFloat`/
  * `getDouble` straight off ArrayData, double accumulator, left-to-right
  * order preserved so results stay bit-identical to the sequential oracle).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"vec_dot needs arrays, got $other")
  }

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs float/double arrays, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    val leftFloat = elemType(left) == FloatType
    val rightFloat = elemType(right) == FloatType
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val ra = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$la($i) * (double) $b.$ra($i);
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit LSH bucket id over `numPlanes` deterministic pseudo-random
  * hyperplanes in one codegen'd pass. Plane components derive from
  * xxhash64 exactly as the column form did —
  * `xxhash64(lit(plane), i).cast(double) / Long.MaxValue` with the
  * multi-arg seed chain (42 → hash(plane) → hash(i)) — and the projection
  * accumulates left-to-right in double, so bucket ids are bit-identical to
  * the replaced `aggregate(zip_with(vec, sequence(...), ...))` stack,
  * which ran 2 interpreted lambda passes per plane per row.
  */
case class HyperplaneBuckets(child: Expression, numPlanes: Int, seedOffset: Int)
  extends UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket needs a float/double array, got $other")
  }

  // A NULL vector buckets to 0L (the all-bits-unset bucket the pre-expression
  // column form produced) instead of a NULL bucket that would silently drop
  // the row out of the LSH join.
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else HyperplaneBuckets.run(numPlanes, seedOffset, elemFloat, v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |long ${ev.value} = ${childGen.isNull} ? 0L :
         |  graft.expr.HyperplaneBuckets$$.MODULE$$.run(
         |    $numPlanes, $seedOffset, $elemFloat, ${childGen.value});
         |""".stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {

  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  def run(numPlanes: Int, seedOffset: Int, elemFloat: Boolean, vec: ArrayData): Long = {
    val n = vec.numElements()
    var bits = 0L
    var pl = 0
    while (pl < numPlanes) {
      // Seed chain of the 2-arg xxhash64: 42 → hash(plane) → hash(dim).
      val planeSeed = XxHash64Function.hash(seedOffset + pl, IntegerType, 42L)
      var acc = 0.0
      var any = false
      var i = 0
      while (i < n) {
        // Null elements contribute 0 — the same policy as the oracle's
        // list_sum — so a partially-null embedding buckets identically in
        // both engines. If NO element contributes (empty or all-null
        // array), list_sum yields NULL there and `>= 0` is false, so the
        // bit must stay unset here too rather than defaulting to acc=0.0.
        if (!vec.isNullAt(i)) {
          val comp = XxHash64Function.hash(i, IntegerType, planeSeed).toDouble /
            Long.MaxValue.toDouble
          val v = if (elemFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          acc += v * comp
          any = true
        }
        i += 1
      }
      if (any && acc >= 0) bits |= 1L << pl
      pl += 1
    }
    bits
  }
}

/** Sign-bit LSH bucket id against an EXPLICIT plane matrix
  * (`planes(p)(d)`), for plane families whose components are precomputed
  * on the driver (e.g. the md5-derived oracle-parity planes). The matrix
  * rides into codegen as a reference object, so the generated code stays a
  * single call no matter how many planes×dims — the inline
  * `when(vec_dot(vec, lit(array...)))` tree compiled 12 64-element array
  * literals per bucket column and bloated whole-stage codegen.
  */
case class PlaneBuckets(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"plane_buckets needs a float/double array, got $other")
  }

  // NULL vector → bucket 0L, same policy as HyperplaneBuckets.
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else PlaneBuckets.run(planes, elemFloat, v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val code =
      code"""
         |${childGen.code}
         |long ${ev.value} = ${childGen.isNull} ? 0L :
         |  graft.expr.PlaneBuckets$$.MODULE$$.run(
         |    $planesRef, $elemFloat, ${childGen.value});
         |""".stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneBuckets =
    copy(child = newChild)
}

object PlaneBuckets {
  def run(planes: Array[Array[Double]], elemFloat: Boolean, vec: ArrayData): Long = {
    val n = vec.numElements()
    var bits = 0L
    var pl = 0
    while (pl < planes.length) {
      val comps = planes(pl)
      val m = math.min(n, comps.length)
      var acc = 0.0
      var any = false
      var i = 0
      while (i < m) {
        // Null elements contribute 0, matching the oracle's list_sum; an
        // empty/all-null vector leaves the bit unset (NULL list_sum there).
        if (!vec.isNullAt(i)) {
          val v = if (elemFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          acc += v * comps(i)
          any = true
        }
        i += 1
      }
      if (any && acc >= 0) bits |= 1L << pl
      pl += 1
    }
    bits
  }
}

/** Dense projection of a float/double vector through a literal plane
  * matrix: output j = Σ_d vec(d)·planes(j)(d) — the value-carrying sibling
  * of [[PlaneBuckets]] (which keeps only the sign bits). One codegen'd
  * call per row computes every output component; the matrix rides along
  * as a broadcast-free literal reference, so the projection is a map-only
  * stage a 1000-executor scan runs without any state shipping.
  *
  * Length mismatch semantics (deliberate, shared with [[PlaneBuckets]]
  * and the SQL oracle's `range(1, dims+1)` form, where out-of-range list
  * indexes are NULL and drop from the sum): the dot runs over
  * min(vector length, matrix dims). A vector SHORTER than the declared
  * dims therefore projects silently through its prefix — callers that
  * can't rule out schema drift should validate dimensions upstream
  * (e.g. `size(col) === dims`) rather than rely on this truncation.
  */
case class PlaneProject(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"plane_project needs a float/double array, got $other")
  }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    PlaneProject.run(planes, elemFloat, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.PlaneProject$$.MODULE$$.run(" +
        s"$planesRef, $elemFloat, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneProject =
    copy(child = newChild)
}

object PlaneProject {
  def run(planes: Array[Array[Double]], elemFloat: Boolean,
      vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Double](planes.length)
    var pl = 0
    while (pl < planes.length) {
      val comps = planes(pl)
      val m = math.min(n, comps.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        // Null elements contribute 0, matching the oracle's list handling.
        if (!vec.isNullAt(i)) {
          val v = if (elemFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          acc += v * comps(i)
        }
        i += 1
      }
      out(pl) = acc
      pl += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExprs {
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def lshBucket(vec: Column, numPlanes: Int, seedOffset: Int = 0): Column =
    GraftColumnBridge.column(
      HyperplaneBuckets(GraftColumnBridge.expression(vec), numPlanes, seedOffset))

  def planeBuckets(vec: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      PlaneBuckets(GraftColumnBridge.expression(vec), planes))

  def planeProject(vec: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      PlaneProject(GraftColumnBridge.expression(vec), planes))
}
