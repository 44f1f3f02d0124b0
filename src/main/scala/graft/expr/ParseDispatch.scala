package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One variant of a first-match-wins regex dispatch: regex, the capture
  * names in group order (`_` = discarded), the names that must be non-null
  * after coercion for the match to count, and (for broadcast variants) the
  * type literal the matched group stamps on the row.
  */
case class DispatchVariant(
    regex: String,
    columns: Seq[String],
    required: Seq[String],
    broadcastType: Option[String])

/** Driver-precompiled form of one variant. Field kinds: 0 = null,
  * 1 = trimmed string (blank→null), 2 = comma-stripped long, 3 = comma-
  * stripped int, 4 = broadcast-type literal.
  */
final class CompiledDispatchVariant(
    val pattern: Pattern,
    val kinds: Array[Int],
    val groups: Array[Int],
    val btype: UTF8String,
    val requiredIdx: Array[Int],
    // indexOf prefilter: a literal every match must contain, or null.
    val prefilter: String) extends Serializable

final class DispatchTable(val variants: Array[CompiledDispatchVariant]) extends Serializable

final class LabelTable(
    val patterns: Array[Pattern],
    val labels: Array[UTF8String],
    val prefilters: Array[String],
    val default: UTF8String) extends Serializable

/** The whole 18-group × 35-variant parse dispatch as ONE compact
  * expression: per row, try each compiled pattern in config order and
  * return the first variant whose required columns validate, as a struct
  * of the full payload (null when nothing matches) — the declarative
  * first-match-wins loop of `/root/reference/src/2_parse_engine.py:134-260`
  * executed as a single short-circuiting JVM method.
  *
  * Why not a coalesce of 35 `when(rlike, struct(...))` branches (round-1
  * shape): that tree was so large it (a) needed a non-deterministic
  * optimizer barrier to stop SimplifyExtractValueOps from duplicating it
  * per extracted field, which excluded it from whole-stage codegen, and
  * (b) shipped an 8 MiB task binary. This node is deterministic and opaque
  * to the optimizer (field extraction can't be rewritten through it),
  * codegen is one method call, and the only shipped state is the compiled
  * dispatch table in the references array.
  */
case class ParseDispatch(
    child: Expression,
    variants: Seq[DispatchVariant],
    payload: Seq[(String, DataType)])
  extends UnaryExpression {

  override def dataType: DataType =
    StructType(payload.map { case (n, t) => StructField(n, t, nullable = true) })
  override def nullable: Boolean = true

  @transient private lazy val table: DispatchTable = ParseDispatch.compile(variants, payload)

  override def nullSafeEval(input: Any): Any =
    ParseDispatch.run(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("graftDispatchTable", table, "graft.expr.DispatchTable")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.expr.ParseDispatch$$.MODULE$$.run($tableRef, $in);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseDispatch =
    copy(child = newChild)
}

object ParseDispatch {

  def compile(variants: Seq[DispatchVariant], payload: Seq[(String, DataType)]): DispatchTable = {
    val fieldNames = payload.map(_._1)
    val compiled = variants.map { v =>
      // First occurrence wins for duplicate capture names (reference takes
      // the first mapped group).
      val colGroup = scala.collection.mutable.LinkedHashMap[String, Int]()
      v.columns.zipWithIndex.foreach { case (n, i) =>
        if (n != "_" && !colGroup.contains(n)) colGroup(n) = i + 1
      }
      val kinds = new Array[Int](payload.length)
      val groups = new Array[Int](payload.length)
      payload.zipWithIndex.foreach { case ((name, t), i) =>
        if (name == "Broadcast_Type" && v.broadcastType.isDefined) kinds(i) = 4
        else colGroup.get(name) match {
          case Some(g) =>
            groups(i) = g
            kinds(i) = t match {
              case LongType => 2
              case IntegerType => 3
              case _ => 1
            }
          case None => kinds(i) = 0
        }
      }
      // Fail fast on config typos: a required name missing from the payload,
      // or never produced by this variant (not captured and not the stamped
      // Broadcast_Type), would make the variant silently unmatchable.
      val reqIdx = v.required.map { name =>
        val idx = fieldNames.indexOf(name)
        require(idx >= 0,
          s"required column '$name' is not a payload field (variant: ${v.regex})")
        require(kinds(idx) != 0,
          s"required column '$name' is never produced by variant: ${v.regex}")
        idx
      }.toArray
      new CompiledDispatchVariant(Pattern.compile(v.regex), kinds, groups,
        v.broadcastType.map(UTF8String.fromString).orNull, reqIdx,
        RegexPrefilter.requiredLiteral(v.regex).orNull)
    }
    new DispatchTable(compiled.toArray)
  }

  /** Shared evaluator (interpreted eval and generated code both land here). */
  def run(t: DispatchTable, s: UTF8String): InternalRow = {
    if (s == null) return null
    val str = s.toString
    val vs = t.variants
    var vi = 0
    while (vi < vs.length) {
      val v = vs(vi)
      // Literal prefilter: indexOf is far cheaper than a failed regex scan,
      // and a row missing a required literal can never match the pattern.
      if (v.prefilter != null && str.indexOf(v.prefilter) < 0) {
        vi += 1
      } else {
      val m = v.pattern.matcher(str)
      if (m.find()) {
        val kinds = v.kinds
        val vals = new Array[Any](kinds.length)
        var i = 0
        while (i < kinds.length) {
          kinds(i) match {
            case 0 =>
            case 4 => vals(i) = v.btype
            case 1 =>
              val g = m.group(v.groups(i))
              if (g != null) {
                val trimmed = trimSpaces(g)
                if (!trimmed.isEmpty) vals(i) = UTF8String.fromString(trimmed)
              }
            case 2 =>
              val g = m.group(v.groups(i))
              if (g != null) vals(i) = parseLongOrNull(g)
            case 3 =>
              val g = m.group(v.groups(i))
              if (g != null) vals(i) = parseIntOrNull(g)
          }
          i += 1
        }
        var ok = true
        val req = v.requiredIdx
        var r = 0
        while (ok && r < req.length) {
          if (vals(req(r)) == null) ok = false
          r += 1
        }
        if (ok) return new GenericInternalRow(vals)
      }
      vi += 1
      }
    }
    null
  }

  /** Space-only trim, matching `functions.trim` (blank→null upstream). */
  private def trimSpaces(s: String): String = WordShingles.trimSpaces(s)

  /** Numeric captures must be pure digit/comma strings (possibly signed).
    * This is intentionally stricter than Spark's string→long cast, which
    * also accepts fractional strings ('12.5' → 12) and trims control
    * whitespace — the dispatch regexes only ever capture `[\d,]+`, so a
    * capture that fails here is a config error, not data to salvage.
    */
  private def stripCommasTrim(s: String): String = trimSpaces(s).replace(",", "")

  private def parseLongOrNull(g: String): java.lang.Long = {
    val c = stripCommasTrim(g)
    if (c.isEmpty) null
    else try java.lang.Long.valueOf(c) catch { case _: NumberFormatException => null }
  }

  private def parseIntOrNull(g: String): java.lang.Integer = {
    val c = stripCommasTrim(g)
    if (c.isEmpty) null
    else try java.lang.Integer.valueOf(c) catch { case _: NumberFormatException => null }
  }

  def dispatch(c: Column, variants: Seq[DispatchVariant], payload: Seq[(String, DataType)]): Column =
    GraftColumnBridge.column(ParseDispatch(GraftColumnBridge.expression(c), variants, payload))
}

/** First regex (in rule order) that matches the input selects its label;
  * no match → the default. Powers the dead-letter failure reason
  * (`2_parse_engine.py:141-167,249-260`: LAST matching-but-invalid variant
  * wins, so callers pass variants reversed) as one compact expression
  * instead of a coalesce over 36 `rlike` branches.
  */
case class FirstMatchLabel(child: Expression, rules: Seq[(String, String)], default: String)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  @transient private lazy val table: LabelTable = new LabelTable(
    rules.map(r => Pattern.compile(r._1)).toArray,
    rules.map(r => UTF8String.fromString(r._2)).toArray,
    rules.map(r => RegexPrefilter.requiredLiteral(r._1).orNull).toArray,
    UTF8String.fromString(default))

  override def nullSafeEval(input: Any): Any =
    FirstMatchLabel.run(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("graftLabelTable", table, "graft.expr.LabelTable")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.expr.FirstMatchLabel$$.MODULE$$.run($tableRef, $in);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): FirstMatchLabel =
    copy(child = newChild)
}

object FirstMatchLabel {

  def run(t: LabelTable, s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    var i = 0
    while (i < t.patterns.length) {
      if ((t.prefilters(i) == null || str.indexOf(t.prefilters(i)) >= 0) &&
        t.patterns(i).matcher(str).find()) return t.labels(i)
      i += 1
    }
    t.default
  }

  def label(c: Column, rules: Seq[(String, String)], default: String): Column =
    GraftColumnBridge.column(FirstMatchLabel(GraftColumnBridge.expression(c), rules, default))
}
