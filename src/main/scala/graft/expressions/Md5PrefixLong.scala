package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hash: the integer value of the first `hexDigits`
  * hex characters of `md5(input)` — the engine's universal
  * SQL-reproducible hash (`TextFunctions.md5Int`, used by MinHash,
  * SimHash, winnowing, LSH planting, splits, salts…).
  *
  * The built-in composition `conv(substring(md5(c),1,n),16,10)`
  * materializes a 32-char hex UTF8String per row, substrings it, and
  * re-parses the hex — three allocations and a base-conversion on the
  * hottest per-row path in the engine (the winnowing window explode
  * alone evaluates it O(total-chars) times). This expression digests
  * the UTF8 bytes and shifts the leading 8 digest bytes down to the
  * requested width — zero intermediate strings, same codegen spans.
  *
  * Bit-identical by construction: the first `n` hex chars of the
  * digest are its leading 4·n bits, so the value is
  * `(first 8 bytes as big-endian u64) >>> (64 − 4·n)`; `n ≤ 15` keeps
  * it inside a positive signed long exactly like the `conv` path.
  */
case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression {
  require(hexDigits > 0 && hexDigits <= 15,
    "hexDigits must be in [1, 15] (16+ overflows a signed long)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_long requires a string input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_long"

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLong.hash(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Md5PrefixLong.hash($c, $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Leading `hexDigits` hex chars of md5(s) as an unsigned value in a
    * long. Public + static-shaped so generated code can call it. */
  def hash(s: UTF8String, hexDigits: Int): Long = {
    val md = digests.get()
    md.reset()
    val h = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> (64 - 4 * hexDigits)
  }
}
