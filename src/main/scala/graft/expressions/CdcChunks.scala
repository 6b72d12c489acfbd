package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the LBFS cut-point idea — Muthitacharoen
  * et al. SOSP'01; the FastCDC/Gear family refines the same rule):
  * chunk boundaries fall where a sliding `window`-char hash hits a
  * mask, so boundaries are CONTENT-LOCAL — inserting or deleting bytes
  * shifts only the chunks that contain the edit, and every other
  * chunk's digest survives. That invariance is the whole point: it is
  * what makes chunk-level dedup across a 100 TB lake robust to
  * re-uploads with prepended headers/footers, where fixed-size
  * blocking would re-digest everything (the spec pins it by prepending
  * a preamble and counting surviving digests).
  *
  * Determinism contract: the boundary test is
  * `md5Int("cdc:" + text[i..i+window)) % mask == 0` — the engine's
  * md5 closed-form convention — and EVERY qualifying window cuts
  * (stateless rule, no post-cut skip-ahead). Real CDC implementations
  * restart the window after each cut and impose min/max chunk sizes;
  * that sequential rule needs recursion to restate in SQL, so the
  * engine deliberately pins the stateless variant both sides — same
  * content-locality, plain-SQL oracle. Output chunks are the segments
  * between consecutive cut points (cut after the window's last char),
  * `(off 1-based, len, chunk_md5)`; text shorter than the window is
  * one whole-text chunk; empty text yields no chunks.
  */
case class CdcChunks(child: Expression, window: Int, mask: Int)
    extends UnaryExpression {
  require(window >= 2 && mask >= 2, "cdc needs window >= 2 and mask >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks requires a string input, got $t")
  }
  override def dataType: DataType = CdcChunks.schema
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunk(input.asInstanceOf[UTF8String].toString, window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CdcChunks.chunk($c.toString(), $window, $mask);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def hex(d: Array[Byte]): String =
    d.map(b => f"${b & 0xff}%02x").mkString

  /** md5Int(s, 8): first 4 digest bytes as an unsigned int. */
  private def md5Int8(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Public + static-shaped so generated code can call it. */
  def chunk(text: String, window: Int, mask: Int): GenericArrayData = {
    val n = text.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val cuts = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 1 // 1-based window start, cut AFTER the window's last char
    while (i <= n - window + 1) {
      if (md5Int8(md, "cdc:" + text.substring(i - 1, i - 1 + window)) % mask == 0)
        cuts += i + window - 1
      i += 1
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    val out = new Array[Any](cuts.length)
    var start = 1
    var c = 0
    while (c < cuts.length) {
      val end = cuts(c)
      md.reset()
      val digest = md.digest(
        text.substring(start - 1, end).getBytes("UTF-8"))
      out(c) = new GenericInternalRow(Array[Any](start, end - start + 1,
        UTF8String.fromString(hex(digest))))
      start = end + 1
      c += 1
    }
    new GenericArrayData(out)
  }
}
