package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as native expressions. Spark has no
  * built-in normalizer, yet a crawl corpus mixes precomposed ("é") and
  * decomposed ("e"+U+0301) encodings of the SAME text — exact dedup,
  * shingling, tokenization and equality joins all silently treat them
  * as different documents unless ingestion canonicalizes first. NFC is
  * the canonical-composition form every major pipeline normalizes to.
  *
  * Codegen calls the static helpers below, so the expressions stay
  * inside whole-stage spans; [[IsNfc]] rides
  * `Normalizer.isNormalized`'s quick-check path (one pass, no
  * allocation for the overwhelmingly-NFC common case) and
  * [[NfcNormalize]] fast-paths already-normalized input to return the
  * original UTF8String without a copy — at 100 TB the normalizer is a
  * near-free scan guard, not a per-row string rebuild.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnicodeNorm.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** True iff the string is already in NFC (quick-check only, no
  * normalized copy is built). */
case class IsNfc(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_is_nfc requires a string input, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_is_nfc"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.isNfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnicodeNorm.isNfc($c);")

  override protected def withNewChildInternal(newChild: Expression): IsNfc =
    copy(child = newChild)
}

object UnicodeNorm {
  import java.text.Normalizer

  /** NFC-normalize; returns the INPUT object unchanged when already
    * normalized (the common case — zero copies on the fast path). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def isNfc(s: UTF8String): Boolean =
    Normalizer.isNormalized(s.toString, Normalizer.Form.NFC)
}
