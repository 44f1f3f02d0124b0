package graft

import graft.expr.{Int8Dot, PackInt8, ParseDuration, VecDot, ZOrder}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * makes `parse_duration(str)` and `vec_dot(a, b)` available to plain SQL
  * alongside the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("parse_duration"),
      new ExpressionInfo(classOf[ParseDuration].getName, "parse_duration"),
      GraftExtensions.unary("parse_duration")(ParseDuration(_))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      GraftExtensions.binary("vec_dot")(VecDot(_, _))))
    // z_order(bits, c1, c2, ...) — first arg is the integer bit width.
    ext.injectFunction((
      FunctionIdentifier("z_order"),
      new ExpressionInfo(classOf[ZOrder].getName, "z_order"),
      GraftExtensions.mkZOrder))
    ext.injectFunction((
      FunctionIdentifier("pack_int8"),
      new ExpressionInfo(classOf[PackInt8].getName, "pack_int8"),
      GraftExtensions.unary("pack_int8")(PackInt8(_))))
    ext.injectFunction((
      FunctionIdentifier("int8_dot"),
      new ExpressionInfo(classOf[Int8Dot].getName, "int8_dot"),
      GraftExtensions.binary("int8_dot")(Int8Dot(_, _))))
    // word_shingles(text, n [, distinct]) — the tokenize+shingle primitive
    // under the whole dedup/text family, exposed to plain SQL.
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.expr.WordShingles].getName,
        "word_shingles"),
      GraftExtensions.mkWordShingles))
    // nfc_normalize(text) — Unicode NFC, named after DuckDB's function so
    // SQL carrying the corpus-hygiene step ports both ways.
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.expr.NfcNormalize].getName,
        "nfc_normalize"),
      GraftExtensions.unary("nfc_normalize")(graft.expr.NfcNormalize(_))))
    // jaro_winkler(a, b) — prefix-weighted record-linkage similarity,
    // named after DuckDB's jaro_winkler_similarity semantics it pins.
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.expr.JaroWinkler].getName,
        "jaro_winkler"),
      GraftExtensions.binary("jaro_winkler")(graft.expr.JaroWinkler(_, _))))
    // compress_stats(text) — the DEFLATE redundancy screen as SQL.
    ext.injectFunction((
      FunctionIdentifier("compress_stats"),
      new ExpressionInfo(classOf[graft.expr.CompressStats].getName,
        "compress_stats"),
      GraftExtensions.unary("compress_stats")(graft.expr.CompressStats(_))))
    // cdc_chunks(bin, min, avgBits, max) — content-defined chunk table.
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[graft.expr.CdcChunks].getName, "cdc_chunks"),
      GraftExtensions.mkCdcChunks))
    // Custom whole-operator plan: as-of join (graft.plans.AsOfJoinPlan →
    // co-partitioned sort-merge AsOfJoinExec) plus the probe-filter
    // pushdown Catalyst cannot provide for a node it does not know.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteAsOfTimeJoin)
    ext.injectOptimizerRule(_ => graft.plans.PushProbeFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
    // asof_time(probe_ts, build_ts [, strategy]) — the SQL as-of marker
    // RewriteAsOfTimeJoin turns into the native AsOfJoinPlan.
    ext.injectFunction((
      FunctionIdentifier("asof_time"),
      new ExpressionInfo(classOf[graft.expr.AsOfTime].getName, "asof_time"),
      GraftExtensions.mkAsOfTime))
  }
}

object GraftExtensions {

  /** Arity-checked builder for two-argument functions: a clean
    * IllegalArgumentException naming the function instead of an
    * IndexOutOfBoundsException escaping the registry on `f(x)`.
    */
  private[graft] def binary(name: String)(
      f: (Expression, Expression) => Expression): Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case xs => throw new IllegalArgumentException(
      s"$name(a, b) expects exactly 2 arguments, got ${xs.size}")
  }

  /** Arity-checked builder for one-argument functions: `children.head`
    * would silently DISCARD extra arguments (a plausible user typo
    * evaluates the first and ignores the rest) and escape as a bare
    * NoSuchElementException on zero.
    */
  private[graft] def unary(name: String)(
      f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case xs => throw new IllegalArgumentException(
      s"$name(x) expects exactly 1 argument, got ${xs.size}")
  }

  /** Runtime registration into an already-built session (the extensions
    * class only applies at session build; this covers notebook/REPL use).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_duration", unary("parse_duration")(ParseDuration(_)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", binary("vec_dot")(VecDot(_, _)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_order", mkZOrder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pack_int8", unary("pack_int8")(PackInt8(_)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_dot", binary("int8_dot")(Int8Dot(_, _)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", mkWordShingles, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", unary("nfc_normalize")(graft.expr.NfcNormalize(_)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", binary("jaro_winkler")(graft.expr.JaroWinkler(_, _)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compress_stats", unary("compress_stats")(graft.expr.CompressStats(_)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_chunks", mkCdcChunks, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "asof_time", mkAsOfTime, "built-in")
  }

  /** `asof_time(probe_ts, build_ts [, strategy literal])`; the default
    * `backward` matches DuckDB ASOF JOIN / pandas merge_asof convention.
    */
  private[graft] def mkAsOfTime(
      children: Seq[Expression]): graft.expr.AsOfTime = children match {
    case Seq(pt, bt) => graft.expr.AsOfTime(pt, bt, "backward")
    case Seq(pt, bt, Literal(s: org.apache.spark.unsafe.types.UTF8String, _)) =>
      graft.expr.AsOfTime(pt, bt, s.toString)
    case _ => throw new IllegalArgumentException(
      "asof_time(probe_ts, build_ts [, strategy string literal])")
  }

  /** `word_shingles(text, n literal [, distinct literal])`. */
  private[graft] def mkWordShingles(
      children: Seq[Expression]): graft.expr.WordShingles = children match {
    case Seq(text, Literal(n: Int, _)) =>
      graft.expr.WordShingles(text, n, distinct = false)
    case Seq(text, Literal(n: Int, _), Literal(d: Boolean, _)) =>
      graft.expr.WordShingles(text, n, d)
    case _ => throw new IllegalArgumentException(
      "word_shingles(text, n literal [, distinct literal])")
  }

  /** `cdc_chunks(bin, min literal, avgBits literal, max literal)`. */
  private[graft] def mkCdcChunks(
      children: Seq[Expression]): graft.expr.CdcChunks = children match {
    case Seq(bin, Literal(mn: Int, _), Literal(b: Int, _), Literal(mx: Int, _)) =>
      graft.expr.CdcChunks(bin, mn, b, mx)
    case _ => throw new IllegalArgumentException(
      "cdc_chunks(bin, minSize literal, avgBits literal, maxSize literal)")
  }

  /** `z_order(bitsPerDim literal, col1, col2, ...)` — one builder shared by
    * both registration paths so SQL behavior can't diverge between them.
    */
  private[graft] def mkZOrder(children: Seq[Expression]): ZOrder = children match {
    case Literal(bits: Int, _) +: cols if cols.nonEmpty => ZOrder(cols, bits)
    case _ => throw new IllegalArgumentException(
      "z_order(bitsPerDim literal, col1, col2, ...)")
  }
}
