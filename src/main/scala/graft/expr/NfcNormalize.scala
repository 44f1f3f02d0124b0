package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — canonical
  * composition ("e" + U+0301 → "é") per UAX #15, via the JVM's built-in
  * `java.text.Normalizer`. The corpus-hygiene step that must run BEFORE
  * any hash-keyed dedup or fingerprinting: the same visible text arrives
  * from the web in composed and decomposed forms, and without NFC those
  * are different md5s, different shingles, different dedup keys.
  *
  * Spark has no built-in for this (`lower`/`trim` don't touch combining
  * marks); a Scala UDF would serialize per row. NFC output is defined by
  * the Unicode standard, so any conforming engine (DuckDB's
  * `nfc_normalize`, ICU, the JVM) produces identical bytes — which is
  * what makes it oracle-checkable.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  // Analysis-time rejection (the JaroWinkler note): a non-string child
  // would otherwise surface as a runtime ClassCastException.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expr.NfcNormalize$$.MODULE$$.run($in);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def run(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: Normalizer.isNormalized is a cheap scan that avoids the
    // rebuild for the (overwhelmingly common) already-composed case.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
