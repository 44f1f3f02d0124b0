package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Run `pattern` ONCE against the input (find semantics, like Python
  * `re.search` / Spark `rlike`) and return ALL capture groups as
  * `ARRAY<STRING>` — null when there is no match; a non-participating
  * optional group becomes a null element.
  *
  * Why this exists: the parse dispatch (PatternCompiler) needs, per
  * variant, a match test + one value per mapped column + one per required
  * column. Built from `rlike` + N × `regexp_extract` that is N+1 regex
  * executions per variant and a generated-code blowup that pushed the
  * 35-variant projection past the whole-stage-codegen size limits. With
  * one `RegexGroups` per variant the regex runs once and the struct fields
  * are plain array indexing.
  *
  * The compiled `Pattern` is cached per-instance (the pattern is a
  * foldable config literal by construction).
  */
case class RegexGroups(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RegexGroups.run(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Compile the pattern once per generated class.
    val patRef = ctx.addMutableState("java.util.regex.Pattern", "graftPattern",
      v => s"""$v = java.util.regex.Pattern.compile(${ctx.addReferenceObj("pat", pattern)});""")
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = graft.expr.RegexGroups$$.MODULE$$.run($patRef, $in);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexGroups =
    copy(child = newChild)
}

object RegexGroups {

  /** Shared evaluator: null on no-match, else the groups (1..groupCount). */
  def run(p: Pattern, s: UTF8String): ArrayData = {
    if (s == null) return null
    val m = p.matcher(s.toString)
    if (!m.find()) null
    else {
      val n = m.groupCount()
      val out = new Array[Any](n)
      var i = 1
      while (i <= n) {
        val g = m.group(i)
        out(i - 1) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def regexGroups(c: Column, pattern: String): Column =
    GraftColumnBridge.column(RegexGroups(GraftColumnBridge.expression(c), pattern))
}
