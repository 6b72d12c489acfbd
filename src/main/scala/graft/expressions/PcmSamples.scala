package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Native bulk PCM decode: every signed 16-bit little-endian sample of
  * a CANONICAL-header WAV (44-byte RIFF/fmt/data preamble, the layout
  * [[graft.operators.Multimodal.wavBytesPcm]] emits and `wavMeta`
  * validates) as `array<int>`, in one call. The per-sample composed
  * form (`transform(sequence(...), j -> substr→hex→conv)`) evaluates
  * an interpreted lambda per sample — ~µs each, which at 512 samples ×
  * corpus scale dominated q262's wall time (9 s of 13 at sf0.1); this
  * is the [[WinnowSelect]] move applied to audio: one codegen'd call,
  * one primitive-array pass, zero per-sample allocation.
  *
  * NULL for inputs too short to hold the canonical header. Trailing
  * odd byte (malformed payload) is ignored — the decoded prefix is
  * returned, matching the per-sample reader which would conv an
  * incomplete slice. */
case class PcmSamples(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pcm_samples requires a binary input, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pcm_samples"

  override def nullSafeEval(input: Any): Any =
    PcmSamples.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.expressions.PcmSamples.decode($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): PcmSamples =
    copy(child = newChild)
}

object PcmSamples {
  private val HeaderBytes = 44

  /** Decode helper, public + static-shaped for generated code. Returns
    * null (→ SQL NULL) when the input cannot hold the header. */
  def decode(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < HeaderBytes) return null
    val n = (bytes.length - HeaderBytes) / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val lo = bytes(HeaderBytes + 2 * i) & 0xff
      val hi = bytes(HeaderBytes + 2 * i + 1)
      out(i) = (hi << 8) | lo
      i += 1
    }
    new GenericArrayData(out)
  }
}
