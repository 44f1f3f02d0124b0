package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `"H:M:S(.f)" | "M:S(.f)" | "S(.f)"` → seconds as DOUBLE.
  *
  * Semantics match the reference's `time_str_to_seconds`
  * (`/root/reference/src/3_transform_data.py:25-43`) exactly:
  * null / unparseable → +Infinity (the reference's sentinel for "no valid
  * time", which sorts last under `min`); more than 3 `:`-parts → 0.0 (the
  * reference falls through every branch and returns the initialized 0).
  *
  * Implemented as a native Catalyst expression with codegen (the generated
  * code calls the static evaluator — same pattern as Spark's own
  * string-op expressions), so PB report plans stay inside whole-stage
  * codegen instead of dropping to a Scala UDF.
  */
case class ParseDuration(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_duration needs a string input, got ${child.dataType}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Double.PositiveInfinity
    else ParseDuration.parse(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val helper = "graft.expr.ParseDuration$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        double ${ev.value} = ${c.isNull} ? Double.POSITIVE_INFINITY :
          $helper.parse(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseDuration =
    copy(child = newChild)
}

object ParseDuration {

  /** Static evaluator shared by interpreted eval and generated code. */
  def parse(s: UTF8String): Double = {
    if (s == null) return Double.PositiveInfinity
    val str = s.toString
    val parts = str.split(":", -1)
    try {
      parts.length match {
        case 3 => intPart(parts(0)) * 3600.0 + intPart(parts(1)) * 60.0 + fracPart(parts(2))
        case 2 => intPart(parts(0)) * 60.0 + fracPart(parts(1))
        case 1 => fracPart(parts(0))
        case _ => 0.0 // >3 parts: reference falls through and returns 0
      }
    } catch {
      case _: NumberFormatException => Double.PositiveInfinity
    }
  }

  /** Python `int(...)`: optional sign, digits, surrounding whitespace. */
  private def intPart(p: String): Long = {
    val t = p.trim
    if (t.isEmpty) throw new NumberFormatException(p)
    java.lang.Long.parseLong(t)
  }

  /** Python `float(...)`: decimal literal, surrounding whitespace. NaN/inf
    * spellings intentionally rejected (the reference never feeds them) —
    * and so are JAVA-ONLY spellings Double.parseDouble accepts but
    * Python's float() raises on: trailing d/D/f/F type suffixes and
    * hex-floats ("3d", "1.5f", "0x1.8p1"). Without the gate a corrupt
    * time like "1:2:3d" parsed as 3723 s and could WIN a min() the
    * +Infinity sentinel should have lost.
    */
  private val PyFloat =
    java.util.regex.Pattern.compile("[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?")

  private def fracPart(p: String): Double = {
    val t = p.trim
    if (!PyFloat.matcher(t).matches()) throw new NumberFormatException(p)
    java.lang.Double.parseDouble(t)
  }

  /** Column-level entry point. */
  def parseDuration(c: Column): Column =
    GraftColumnBridge.column(ParseDuration(GraftColumnBridge.expression(c)))
}
