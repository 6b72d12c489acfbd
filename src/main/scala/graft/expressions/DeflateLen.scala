package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native zlib-deflate length: the byte count of `deflate(utf8(input))`
  * at a fixed compression level, WITHOUT materializing the compressed
  * buffer as a column value. The compressed/raw ratio is a published
  * corpus-quality signal (near-duplicate boilerplate and template spam
  * compress far below natural prose; binary mojibake compresses near
  * 1.0), and it needs only the length — so the expression streams the
  * deflater over the UTF8 bytes and counts output, one reused
  * per-thread Deflater and one reused 8 KiB sink buffer, zero per-row
  * allocation beyond what zlib itself keeps.
  *
  * Level is pinned (6, zlib default) so the signal is stable across
  * runs; JDK zlib output for a fixed (input, level, strategy) is
  * deterministic within a JVM, which is all the gate needs (the
  * correctness row is rows-only — no SQL engine exposes deflate).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires a string input, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.DeflateLen.deflatedLength($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  private val LEVEL = 6

  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(LEVEL))
  private val sinks: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  /** Deflated byte length of the UTF-8 bytes of `s`. Public +
    * static-shaped so generated code can call it. */
  def deflatedLength(s: UTF8String): Int = {
    val d = deflaters.get()
    val sink = sinks.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(sink)
    total
  }
}
