package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition — `e` + COMBINING ACUTE → `é`), the canonicalization step
  * every web-scale text pipeline needs before hashing/dedup: the same
  * visible text arrives in both composed and decomposed forms, and a
  * byte-level fingerprint treats them as different documents.
  *
  * Why a custom Expression (SURVEY.md §7.4 preference order): Spark has
  * no normalization built-in, and a Scala UDF would break whole-stage
  * codegen and pay a UTF8String→String→UTF8String round trip on EVERY
  * row. This operator runs inside codegen via a static call, and its
  * fast path — pure-ASCII input, the overwhelming majority of a real
  * corpus — is a single byte/char count comparison returning the input
  * UNTOUCHED (zero allocation, no java.text.Normalizer walk). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path: one UTF-8 byte per char ⇔ all code points < 0x80,
    // and ASCII is closed under NFC — return the input by reference
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}
