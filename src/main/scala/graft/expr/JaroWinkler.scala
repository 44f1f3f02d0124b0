package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a codegen'd Catalyst expression — the
  * prefix-weighted string similarity standard in record linkage (Winkler
  * 1990), complementing [[graft.ops.FuzzyJoin]]'s Levenshtein leg: edit
  * distance counts operations, Jaro–Winkler rewards shared prefixes and
  * tolerates transpositions, which is what personal/entity name matching
  * wants.
  *
  * Semantics pinned to the common convention DuckDB's
  * `jaro_winkler_similarity` also implements (verified empirically, which
  * is what makes the threshold-join oracle possible):
  *   - Jaro: matches within a `max(|a|,|b|)/2 - 1` window, transpositions
  *     counted as half the out-of-order matches;
  *   - Winkler boost `jaro + l·0.1·(1−jaro)` with common prefix `l ≤ 4`,
  *     applied only when `jaro > 0.7` (the standard boost threshold);
  *   - either side empty → 0.0 (including both empty — DuckDB convention).
  *
  * Spark has no built-in for this; a Scala UDF would box per row. The
  * expression is null-safe codegen'd (one static call, no interpretation
  * in the hot path). Works on UTF-16 code units — identical to byte- or
  * codepoint-based engines on ASCII/BMP text; supplementary-plane parity
  * is not part of the contract.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Analysis-time rejection: without this, jaro_winkler(1, 2) passes
  // analysis (BinaryExpression defaults to success, no implicit cast)
  // and dies mid-scan with a ClassCastException in generated code.

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.StringType &&
        right.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two strings, got ${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expr.JaroWinkler$$.MODULE$$.similarity($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Match statistics behind the score: (matches, halfTranspositionsX2,
    * commonPrefix, |a|, |b|). `halfTranspositionsX2` is the raw count of
    * out-of-order matched positions (transpositions = that / 2), kept
    * integer so specs can pin the DP exactly.
    */
  def stats(a: String, b: String): (Int, Int, Int, Int, Int) = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return (0, 0, 0, la, lb)
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    var outOfOrder = 0
    if (m > 0) {
      var j = 0
      i = 0
      while (i < la) {
        if (aMatch(i)) {
          while (!bMatch(j)) j += 1
          if (a.charAt(i) != b.charAt(j)) outOfOrder += 1
          j += 1
        }
        i += 1
      }
    }
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    (m, outOfOrder, l, la, lb)
  }

  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def similarity(sa: String, sb: String): Double = {
    val (m, outOfOrder, l, la, lb) = stats(sa, sb)
    if (la == 0 || lb == 0 || m == 0) return 0.0
    val md = m.toDouble
    val t = outOfOrder / 2.0
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinkler(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
