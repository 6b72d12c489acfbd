package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** AVI with INTRA-FRAME-COMPRESSED video: MS-RLE8 (biCompression=1,
  * 'MRLE' handler, 8-bit palettized frames) — the deliberate closure
  * of the engine's last multimodal boundary note ("compressed-codec
  * video frames remain the one documented stub"): [[AviRle8Bytes]]
  * emits a real run-length-ENCODED bitstream and [[AviRle8FrameMeans]]
  * is a real RLE8 DECODER — count-byte runs, the 00-escape grammar
  * (00 00 end-of-line, 00 01 end-of-bitmap, 00 02 position delta,
  * 00 NN absolute mode with WORD alignment), palette indirection —
  * not a closed-form restatement. RLE8 is the one in-spec AVI video
  * codec whose decode needs no entropy coder, so the full
  * encode→container→decode loop stays a few hundred lines of exact
  * integer work while exercising everything a compressed codec forces
  * on the pipeline: variable-size frame chunks (the walker can no
  * longer stride by a fixed step), a decode state machine with
  * position escapes, and a palette lookup between stored and rendered
  * values.
  *
  * Planted closed form (what makes the decoder oracle-checkable in
  * ANSI SQL): each frame row tiles into 4 equal runs of w/4 pixels
  * (w must be a multiple of 4 and ≤1020), run value
  * `md5Int("rle:<id>:<f>:<y>:<r>", 8) % 256`; the palette maps index
  * i → (red=i, green=255−i, blue=(7i) mod 256), so per-frame channel
  * means restate as md5 aggregates while a palette-order or
  * index-mapping bug still goes red. Encoded frames are
  * `h·8 + (h−1)·2 + 2 = 10h` bytes against a `w·h`-byte raw 8-bit
  * raster — genuinely compressed whenever w > 10 (the gate query uses
  * widths 20/40/60).
  *
  * Scale shape: both sides are one codegen'd static call per row
  * (plan size O(1) — the [[AviDibBytes]] lesson); the decoder bounds
  * every read by the chunk size and rejects runs that cross row ends,
  * trailing bytes after end-of-bitmap, and totals that disagree with
  * the container length, so an adversarial header cannot drive it
  * past the buffer. */
case class AviRle8Bytes(w: Expression, h: Expression, nFrames: Expression,
    usPerFrame: Expression, docId: Expression) extends QuinaryExpression {

  override def children: Seq[Expression] =
    Seq(w, h, nFrames, usPerFrame, docId)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(w, h, nFrames, usPerFrame).forall(_.dataType.isInstanceOf[IntegerType]) &&
        docId.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_rle8_bytes requires (int w, int h, int nFrames, " +
        s"int usPerFrame, long docId), got ${children.map(_.dataType).mkString(", ")}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avi_rle8_bytes"

  override def nullSafeEval(wv: Any, hv: Any, nf: Any, us: Any,
      id: Any): Any =
    AviRle8Bytes.build(wv.asInstanceOf[Int], hv.asInstanceOf[Int],
      nf.asInstanceOf[Int], us.asInstanceOf[Int], id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (wv, hv, nf, us, id) =>
      s"${ev.value} = graft.expressions.AviRle8Bytes.build($wv, $hv, $nf, $us, $id);")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviRle8Bytes =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4))
}

object AviRle8Bytes {
  /** Runs per encoded row — fixed so the closed form stays 2-D
    * (row, run) instead of carrying a third split dimension. */
  val RunsPerRow = 4

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Planted run value — first 8 hex digits of md5("rle:id:f:y:r") as
    * an unsigned int, mod 256 (`TextFunctions.md5Int(s, 8) % 256`). */
  private[expressions] def runValue(id: Long, f: Int, y: Int, r: Int): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s"rle:$id:$f:$y:$r".getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % 256L).toInt
  }

  /** Palette: index i renders as (red=i, green=255−i, blue=(7i)%256) —
    * non-monotone blue so a palette-order bug cannot cancel out of a
    * mean. RGBQUAD storage order is (blue, green, red, reserved). */
  private[expressions] def palR(i: Int): Int = i
  private[expressions] def palG(i: Int): Int = 255 - i
  private[expressions] def palB(i: Int): Int = (7 * i) % 256

  /** Public + static-shaped so generated code can call it. */
  def build(w: Int, h: Int, nf: Int, us: Int, id: Long): Array[Byte] = {
    val k = RunsPerRow
    require(w > 0 && h > 0 && nf > 0 && us > 0,
      s"avi rle8 params out of range: ${w}x$h, $nf frames, $us us/frame")
    require(w % k == 0 && w / k <= 255,
      s"avi rle8 width must be a multiple of $k and at most ${255 * k}: $w")
    val encSize = h * 2 * k + (h - 1) * 2 + 2 // runs + EOLs + EOB, even
    require(encSize.toLong * nf <= (1 << 22),
      s"avi rle8 payload out of range: $encSize x $nf frames")
    val step = 8 + encSize
    val moviSize = 4 + nf * step
    val total = 1248 + nf * step
    val b = new Array[Byte](total)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { b(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le(off: Int, v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    ascii(0, "RIFF"); le(4, total - 8L, 4); ascii(8, "AVI ")
    // hdrl: avih(8+56) + LIST strl whose strf carries the 1024-byte
    // palette after the BITMAPINFOHEADER
    ascii(12, "LIST"); le(16, 1216, 4); ascii(20, "hdrl")
    ascii(24, "avih"); le(28, 56, 4)
    le(32, us, 4); le(48, nf, 4); le(56, 1, 4); le(60, encSize, 4)
    le(64, w, 4); le(68, h, 4)
    ascii(88, "LIST"); le(92, 1140, 4); ascii(96, "strl")
    ascii(100, "strh"); le(104, 56, 4)
    ascii(108, "vids"); ascii(112, "MRLE")
    le(128, us, 4); le(132, 1000000, 4); le(140, nf, 4); le(144, encSize, 4)
    le(160, w, 2); le(162, h, 2)
    ascii(164, "strf"); le(168, 1064, 4)
    le(172, 40, 4); le(176, w, 4); le(180, h, 4)
    le(184, 1, 2); le(186, 8, 2)
    le(188, 1, 4) // biCompression 1 = BI_RLE8
    le(192, encSize, 4)
    var i = 0
    while (i < 256) {
      val off = 212 + i * 4
      b(off) = palB(i).toByte
      b(off + 1) = palG(i).toByte
      b(off + 2) = palR(i).toByte
      // reserved byte stays zero
      i += 1
    }
    ascii(1236, "LIST"); le(1240, moviSize, 4); ascii(1244, "movi")
    var f = 0
    while (f < nf) {
      val off = 1248 + f * step
      ascii(off, "00dc"); le(off + 4, encSize, 4)
      var p = off + 8
      var y = 0
      while (y < h) {
        var r = 0
        while (r < k) {
          b(p) = (w / k).toByte
          b(p + 1) = runValue(id, f, y, r).toByte
          p += 2
          r += 1
        }
        if (y < h - 1) { p += 2 } // EOL escape 00 00 (bytes stay zero)
        y += 1
      }
      b(p) = 0; b(p + 1) = 1 // end-of-bitmap escape
      f += 1
    }
    b
  }
}

/** Demux + RLE8 decode → per-frame stats; see [[AviRle8Bytes]]. */
case class AviRle8FrameMeans(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_avi_rle8_frames requires a binary input, got $t")
  }
  override def dataType: DataType = AviRle8FrameMeans.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_rle8_frames"

  override def nullSafeEval(input: Any): Any =
    AviRle8FrameMeans.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.AviRle8FrameMeans.decode($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): AviRle8FrameMeans =
    copy(child = newChild)
}

object AviRle8FrameMeans {
  val frameSchema: StructType = StructType(Seq(
    StructField("frame", IntegerType, nullable = false),
    StructField("enc_bytes", IntegerType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fps", DoubleType, nullable = false),
    StructField("frames", ArrayType(frameSchema, containsNull = false),
      nullable = false)))

  private def round4(x: Double): Double =
    math.floor(x * 1e4 + 0.5) / 1e4 // MysqlFunctions.oracleRound(·, 4)

  private def leU(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def magic(b: Array[Byte], off: Int, s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if ((b(off + i) & 0xff) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Full demux + RLE8 decode → stats row, or null for any
    * non-conforming payload. The decode state machine implements the
    * complete MS-RLE8 grammar (encoded runs, EOL/EOB/delta escapes,
    * absolute mode with WORD alignment) even though the planted
    * generator only emits runs+EOL+EOB — spec-grammar inputs built by
    * other writers must decode too (exercised in the spec with a
    * hand-assembled absolute/delta stream). Public + static-shaped so
    * generated code can call it. */
  def decode(avi: Array[Byte]): InternalRow = {
    if (avi == null || avi.length < 1250) return null
    if (!(magic(avi, 0, "RIFF") && magic(avi, 8, "AVI ") &&
        magic(avi, 12, "LIST") && magic(avi, 20, "hdrl") &&
        magic(avi, 24, "avih") && magic(avi, 88, "LIST") &&
        magic(avi, 96, "strl") && magic(avi, 100, "strh") &&
        magic(avi, 108, "vids") && magic(avi, 112, "MRLE") &&
        magic(avi, 164, "strf") && magic(avi, 212 + 1024, "LIST") &&
        magic(avi, 220 + 1024, "movi"))) return null
    if (leU(avi, 168, 4) != 1064) return null // strf: BIH + palette
    if (leU(avi, 172, 4) != 40) return null   // BITMAPINFOHEADER size
    if (leU(avi, 184, 2) != 1) return null    // biPlanes
    if (leU(avi, 186, 2) != 8) return null    // biBitCount: palettized
    if (leU(avi, 188, 4) != 1) return null    // biCompression: BI_RLE8
    val w = leU(avi, 176, 4)
    val h = leU(avi, 180, 4)
    val scale = leU(avi, 128, 4)
    val rate = leU(avi, 132, 4)
    val nf = leU(avi, 140, 4)
    if (w <= 0 || h <= 0 || nf <= 0 || scale <= 0) return null
    if (w * h > (1 << 22) || nf > (1 << 16)) return null
    val wi = w.toInt
    val hi = h.toInt
    val npix = (wi * hi).toDouble
    // palette: RGBQUAD = (blue, green, red, reserved) per index
    val pb = new Array[Int](256)
    val pg = new Array[Int](256)
    val pr = new Array[Int](256)
    var i = 0
    while (i < 256) {
      pb(i) = avi(212 + 4 * i) & 0xff
      pg(i) = avi(213 + 4 * i) & 0xff
      pr(i) = avi(214 + 4 * i) & 0xff
      i += 1
    }
    val frames = new Array[Any](nf.toInt)
    val raster = new Array[Byte](wi * hi)
    var off = 1248
    var f = 0
    while (f < nf) {
      if (off + 8 > avi.length) return null
      if (!magic(avi, off, "00dc")) return null
      val sz = leU(avi, off + 4, 4)
      if (sz < 2 || off + 8 + sz + (sz & 1) > avi.length) return null
      val end = off + 8 + sz.toInt
      java.util.Arrays.fill(raster, 0.toByte)
      var p = off + 8
      var x = 0
      var y = 0
      var done = false
      while (!done) {
        if (p + 2 > end) return null
        val c = avi(p) & 0xff
        val v = avi(p + 1) & 0xff
        p += 2
        if (c > 0) {
          // encoded mode: c pixels of palette index v; runs may not
          // cross the row end (per spec — writers emit EOL instead)
          if (y >= hi || x + c > wi) return null
          var j = 0
          while (j < c) { raster(y * wi + x + j) = v.toByte; j += 1 }
          x += c
        } else if (v == 0) { // end of line
          x = 0; y += 1
        } else if (v == 1) { // end of bitmap
          done = true
        } else if (v == 2) { // position delta (unwritten pixels stay 0)
          if (p + 2 > end) return null
          x += avi(p) & 0xff
          y += avi(p + 1) & 0xff
          p += 2
          if (x > wi || y > hi) return null
        } else { // absolute mode: v literal indices, WORD-aligned
          if (y >= hi || x + v > wi) return null
          if (p + v + (v & 1) > end) return null
          var j = 0
          while (j < v) { raster(y * wi + x + j) = avi(p + j); j += 1 }
          x += v
          p += v + (v & 1)
        }
      }
      if (p != end) return null // bytes after end-of-bitmap
      var sb = 0L
      var sg = 0L
      var sr = 0L
      i = 0
      while (i < wi * hi) {
        val idx = raster(i) & 0xff
        sb += pb(idx); sg += pg(idx); sr += pr(idx)
        i += 1
      }
      frames(f) = new GenericInternalRow(Array[Any](f, sz.toInt,
        round4(sb / npix), round4(sg / npix), round4(sr / npix)))
      off = end + (sz.toInt & 1)
      f += 1
    }
    if (off != avi.length) return null
    new GenericInternalRow(Array[Any](wi, hi, nf,
      round4(rate.toDouble / scale.toDouble), new GenericArrayData(frames)))
  }
}
