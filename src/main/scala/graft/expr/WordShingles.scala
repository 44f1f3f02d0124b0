package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column in ONE codegen'd pass:
  * lower → collapse whitespace → trim → split → join each n-window.
  * Bit-identical to the column-tree form
  * `filter(transform(sequence(...), i => array_join(slice(...))))` over
  * `trim(regexp_replace(lower(c), "\\s+", " "))`, but that form runs the
  * higher-order lambdas interpreted per position — O(tokens) interpreted
  * evals plus an array copy per shingle, and it was being computed three
  * times per jaccard query (sizes + both join sides). One JVM method per
  * row keeps the whole document scan inside whole-stage codegen.
  *
  * `distinct = true` dedups preserving first occurrence (the
  * `array_distinct(shingles(...))` shape used by the jaccard operators).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Analysis-time rejection (the JaroWinkler note): a non-string child
  // would otherwise surface as a runtime ClassCastException.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.run(n, distinct, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.expr.WordShingles$$.MODULE$$.run($n, $distinct, $in);
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Compiled once: String.replaceAll/split("\\s+") re-run
    * Pattern.compile on EVERY call — pure per-row overhead on the
    * corpus-scan expressions written to stay inside codegen. Shared by
    * [[TextStats]].
    */
  private[expr] val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Space-only trim, matching `functions.trim` — the load-bearing
    * normalization primitive. ONE definition (TextStats and
    * ParseDispatch delegate here) so the dedup keys of the three
    * expressions can never silently desync.
    */
  private[expr] def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Lowercase (UTF8String semantics, matching `functions.lower`), collapse
    * runs of whitespace to one space, trim spaces — the canonical form every
    * content-hash dedup variant normalizes to.
    */
  def normalize(s: UTF8String): String =
    trimSpaces(Ws.matcher(s.toLowerCase.toString).replaceAll(" "))

  def run(n: Int, distinct: Boolean, s: UTF8String): ArrayData = {
    val norm = normalize(s)
    val toks = norm.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val count = toks.length - n + 1
    val sb = new java.lang.StringBuilder
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) {
        out(k) = UTF8String.fromString(it.next())
        k += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def shingles(c: Column, n: Int, distinct: Boolean = false): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(c), n, distinct))
}
