package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document token statistics in ONE codegen'd pass: token count,
  * ASCII punctuation count, stopword ratio, mean token length, and one
  * marker-evidence count per language. Field semantics are bit-identical
  * to the column-tree forms they replace (`split(trim(text), "\\s+")`
  * tokenization, space-only trim, `\p{Punct}` counting, guards returning
  * 0 / 0.0 on blank-after-trim text) — but those forms ran `filter`/
  * `aggregate` higher-order lambdas interpreted per token, once per
  * language and once per ratio; language-ID alone walked the token array
  * five times per row outside whole-stage codegen.
  */
case class TextStats(
    child: Expression,
    stopwords: Seq[String],
    markers: Seq[(String, Seq[String])])
  extends UnaryExpression {

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("punct_count", LongType, nullable = false),
      StructField("stop_ratio", DoubleType, nullable = false),
      StructField("mean_tok_len", DoubleType, nullable = false)) ++
      markers.map { case (l, _) => StructField(s"ev_$l", LongType, nullable = false) })

  @transient private lazy val table: TextStatsTable = TextStats.compile(stopwords, markers)

  override def nullSafeEval(input: Any): Any =
    TextStats.run(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("graftTextStats", table, "graft.expr.TextStatsTable")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.expr.TextStats$$.MODULE$$.run($tableRef, $in);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

final class TextStatsTable(
    val stopSet: java.util.HashSet[String],
    val markerSets: Array[java.util.HashSet[String]]) extends Serializable

object TextStats {

  def compile(stopwords: Seq[String], markers: Seq[(String, Seq[String])]): TextStatsTable = {
    val stop = new java.util.HashSet[String]()
    stopwords.foreach(stop.add)
    val ms = markers.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray
    new TextStatsTable(stop, ms)
  }

  /** ASCII punctuation per Java regex `\p{Punct}` (what the replaced
    * `regexp_replace(text, "[\\p{Punct}]", "")` counting matched).
    */
  private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  private def trimSpaces(s: String): String = WordShingles.trimSpaces(s)

  def run(t: TextStatsTable, s: UTF8String): InternalRow = {
    val str = s.toString
    var punct = 0L
    var ci = 0
    while (ci < str.length) {
      if (isPunct(str.charAt(ci))) punct += 1
      ci += 1
    }

    val nLangs = t.markerSets.length
    val vals = new Array[Any](4 + nLangs)
    val ev = new Array[Long](nLangs)

    val trimmed = trimSpaces(str)
    var nTok = 0L
    var stopRatio = 0.0
    var meanLen = 0.0
    if (!trimmed.isEmpty) {
      val otoks = WordShingles.Ws.split(trimmed, -1)
      nTok = otoks.length.toLong
      var lenSum = 0L
      var i = 0
      while (i < otoks.length) {
        lenSum += otoks(i).codePointCount(0, otoks(i).length)
        i += 1
      }
      meanLen = lenSum.toDouble / otoks.length.toDouble
      // Stopwords and language markers tokenize the LOWERCASED text
      // (matching `split(trim(lower(text)), "\\s+")`).
      val ltoks = WordShingles.Ws.split(trimSpaces(s.toLowerCase.toString), -1)
      var stopHits = 0L
      i = 0
      while (i < ltoks.length) {
        val tok = ltoks(i)
        if (t.stopSet.contains(tok)) stopHits += 1
        var k = 0
        while (k < nLangs) {
          if (t.markerSets(k).contains(tok)) ev(k) += 1
          k += 1
        }
        i += 1
      }
      stopRatio = stopHits.toDouble / ltoks.length.toDouble
    }

    vals(0) = nTok
    vals(1) = punct
    vals(2) = stopRatio
    vals(3) = meanLen
    var k = 0
    while (k < nLangs) {
      vals(4 + k) = ev(k)
      k += 1
    }
    new GenericInternalRow(vals)
  }

  def stats(text: Column, stopwords: Seq[String],
      markers: Seq[(String, Seq[String])]): Column =
    GraftColumnBridge.column(
      TextStats(GraftColumnBridge.expression(text), stopwords, markers))
}

/** Minimum `xxhash64` over a document's word k-shingles in one pass — the
  * winnowing-lite fingerprint. Hash of the empty string when the document
  * has fewer than k tokens (matching `when(size(sh) === 0,
  * xxhash64(lit("")))`). Hashes via [[XxHash64Function]], so values are
  * bit-identical to `array_min(transform(sh, s => xxhash64(s)))` without
  * the per-shingle interpreted lambda.
  */
case class ShingleMinHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    ShingleMinHash.run(n, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.expr.ShingleMinHash$$.MODULE$$.run($n, $in);
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {

  private val emptyHash: Long =
    XxHash64Function.hash(UTF8String.fromString(""), StringType, 42L)

  def run(n: Int, s: UTF8String): Long = {
    val norm = WordShingles.normalize(s)
    val toks = norm.split(" ", -1)
    if (toks.length < n) return emptyHash
    val sb = new java.lang.StringBuilder
    var best = Long.MaxValue
    var i = 0
    val count = toks.length - n + 1
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L)
      if (h < best) best = h
      i += 1
    }
    best
  }

  def minHash(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleMinHash(GraftColumnBridge.expression(text), n))
}
