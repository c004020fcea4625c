package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper shared by interpreted eval and generated code (the object
  * has no companion class, so `NfcUtil.nfc(...)` resolves as a plain static
  * call from Janino-compiled code).
  *
  * Fast path: `Normalizer.isNormalized` is a scan without allocation, and
  * ASCII (the overwhelming majority of corpus text) short-circuits it —
  * already-NFC strings return the INPUT UTF8String untouched, so the hot
  * path does zero copies.
  */
object NfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst Unicode NFC normalization — `graft_nfc(text)`.
  *
  * Spark has no built-in Unicode normalizer, and normalization is the
  * FIRST step of any serious text-dedup pipeline: visually identical
  * strings with different combining-character encodings ("café" composed
  * vs decomposed) must hash identically before exact/MinHash dedup, or
  * every downstream signature treats them as distinct documents.
  *
  * Expression (with doGenCode) rather than a UDF, per the engine's
  * extension ladder: participates in whole-stage codegen (no
  * serialization boundary, null handling inlined by nullSafeCodeGen), is
  * foldable for literal inputs, and keeps the surrounding stage fused.
  * Oracle parity: DuckDB's `nfc_normalize` implements the same UAX#15
  * NFC, so normalized output is bit-identical across engines.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    NfcUtil.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
