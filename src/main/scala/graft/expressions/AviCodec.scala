package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuinaryExpression, SeptenaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Canonical AVI-with-uncompressed-DIB-frames encode/decode as native
  * expressions — the same layer move as [[PngBytes]]/[[PngDecode]],
  * made for a different reason. PNG went native because no builtin
  * composition can express zlib-inflate; AVI-DIB byte arithmetic IS
  * expressible with builtins (and was, through round 8), but the
  * composition was a measured scale hazard: the generator is a
  * multi-thousand-node hex-concat tree that `CollapseProject` re-embeds
  * into every one of the decoder's per-byte read sites, giving Catalyst
  * a multi-million-node plan to canonicalize (minutes of driver CPU),
  * and the per-byte reads ride interpreted higher-order-function
  * lambdas (one md5 + string round-trip per byte). Round 8's bench
  * timed out on exactly this pair. As native expressions both sides are
  * one codegen'd static call into a tight JVM loop: plan size O(1),
  * eval cost one pass over the bytes.
  *
  * [[AviDibBytes]] builds the full canonical single-video-stream
  * grammar: `LIST hdrl` carries `avih` and a `LIST strl` with the
  * `strh` stream header (fccType 'vids', handler 'DIB ',
  * dwScale=µs/frame against dwRate=10⁶ → fps, dwLength=frame count)
  * and the `strf` BITMAPINFOHEADER (biBitCount=24, biCompression=
  * BI_RGB — the one video encoding that needs no codec); `LIST movi`
  * carries one `00db` chunk per frame. Frame data follows the DIB
  * raster contract: rows of width·3 BGR bytes padded to 4-byte DWORD
  * boundaries, pad bytes zero as real writers emit. Pixel bytes keep
  * the established md5-per-(doc, frame, byte-index) closed form —
  * `md5Int("avi:<id>:<f>:<i>", 8) % 256`, bit-identical to the round-8
  * builtin generator — so frame CONTENT stays reproducible in ANSI SQL
  * and the q140 oracle is unchanged. (A digest-per-16-byte-block
  * scheme would shave md5 calls, but it would change the closed form
  * on both engine and oracle sides for a path whose cost is now a
  * sub-microsecond JVM loop per byte — not worth breaking the pinned
  * contract.)
  *
  * [[AviFrameMeans]] is a real demuxer+decoder, not a closed-form
  * restatement: it validates the container grammar (RIFF/AVI /hdrl/
  * avih + strl/strh 'vids' + strf BITMAPINFOHEADER with planes=1,
  * 24-bit, BI_RGB + movi, per-frame '00db' magic and size, exact total
  * length), reads dims from the strf (the header that governs frame
  * layout — not avih), fps from strh dwRate/dwScale, then walks every
  * frame's DWORD-padded bottom-up BGR raster into per-frame
  * per-channel means. NULL for any non-conforming payload. An
  * independent plain-Scala RIFF walker re-decodes the same bytes in
  * `StreamingMultimodalSpec` — no shared code with this decoder.
  */
case class AviDibBytes(w: Expression, h: Expression, nFrames: Expression,
    usPerFrame: Expression, docId: Expression) extends QuinaryExpression {

  override def children: Seq[Expression] =
    Seq(w, h, nFrames, usPerFrame, docId)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(w, h, nFrames, usPerFrame).forall(_.dataType.isInstanceOf[IntegerType]) &&
        docId.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_dib_bytes requires (int w, int h, int nFrames, " +
        s"int usPerFrame, long docId), got ${children.map(_.dataType).mkString(", ")}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avi_dib_bytes"

  override def nullSafeEval(wv: Any, hv: Any, nf: Any, us: Any,
      id: Any): Any =
    AviDibBytes.build(wv.asInstanceOf[Int], hv.asInstanceOf[Int],
      nf.asInstanceOf[Int], us.asInstanceOf[Int], id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (wv, hv, nf, us, id) =>
      s"${ev.value} = graft.expressions.AviDibBytes.build($wv, $hv, $nf, $us, $id);")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviDibBytes =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4))
}

object AviDibBytes {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 hex digits of md5(s) as an unsigned int, mod m — the
    * `TextFunctions.md5Int(s, 8) % m` convention every pixel/sample
    * closed form in this family uses. */
  private[expressions] def md5Mod(s: String, m: Long): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % m
  }

  /** md5-derived pixel byte — first 8 hex digits of
    * md5("avi:id:f:i") as an unsigned int, mod 256
    * (`TextFunctions.md5Int(s, 8) % 256`, the ppmBytes convention). */
  private[expressions] def pixelByte(id: Long, f: Int, i: Int): Byte =
    md5Mod(s"avi:$id:$f:$i", 256L).toByte

  /** Scene-structured pixel byte for the shot-boundary gate
    * ([[AviSceneBytes]]): frames partition into SHOTS of
    * `shotLen = 4 + id % 3` frames; each (shot, channel) carries a
    * stable md5 base in [0, 200) and every byte adds independent md5
    * noise in [0, 24) — so within-shot frame means differ only by
    * noise while cuts move the per-channel base. base + noise < 256,
    * no wraparound, keeping the oracle closed form additive. */
  private[expressions] def sceneByte(id: Long, f: Int, i: Int,
      stride: Int): Byte = {
    val shotLen = (4 + id % 3).toInt
    val c = (i % stride) % 3
    val base = md5Mod(s"scene:$id:${f / shotLen}:$c", 200L)
    val noise = md5Mod(s"avin:$id:$f:$i", 24L)
    (base + noise).toByte
  }

  /** Public + static-shaped so generated code can call it. */
  def build(w: Int, h: Int, nf: Int, us: Int, id: Long): Array[Byte] =
    buildImpl(w, h, nf, us, id, scene = false)

  /** [[AviSceneBytes]] variant: same container, [[sceneByte]] pixels. */
  def buildScene(w: Int, h: Int, nf: Int, us: Int, id: Long): Array[Byte] =
    buildImpl(w, h, nf, us, id, scene = true)

  private def buildImpl(w: Int, h: Int, nf: Int, us: Int, id: Long,
      scene: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && nf > 0 && us > 0,
      s"avi params out of range: ${w}x$h, $nf frames, $us us/frame")
    val stride = w * 3 + ((4 - (w * 3) % 4) % 4)
    val fs = stride * h
    require(fs.toLong * nf <= (1 << 22),
      s"avi payload out of range: $fs x $nf frames")
    val pad = fs & 1 // RIFF chunks pad to even
    val step = 8 + fs + pad
    val moviSize = 4 + nf * step
    val b = new Array[Byte](224 + nf * step)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { b(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le(off: Int, v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    ascii(0, "RIFF"); le(4, 212L + moviSize, 4); ascii(8, "AVI ")
    ascii(12, "LIST"); le(16, 192, 4); ascii(20, "hdrl")
    // avih: µs/frame, maxBytesPerSec, padding, flags, totalFrames,
    // initialFrames, streams, suggestedBufferSize, w, h, reserved[4]
    ascii(24, "avih"); le(28, 56, 4)
    le(32, us, 4); le(48, nf, 4); le(56, 1, 4); le(60, fs, 4)
    le(64, w, 4); le(68, h, 4) // 36..47, 52..55, 72..87 stay zero
    ascii(88, "LIST"); le(92, 116, 4); ascii(96, "strl")
    // strh: fccType, handler, flags, prio+lang, initialFrames, scale,
    // rate, start, length, suggestedBufferSize, quality, sampleSize, rcFrame
    ascii(100, "strh"); le(104, 56, 4)
    ascii(108, "vids"); ascii(112, "DIB ")
    le(128, us, 4); le(132, 1000000, 4); le(140, nf, 4); le(144, fs, 4)
    le(160, w, 2); le(162, h, 2)
    // strf: BITMAPINFOHEADER
    ascii(164, "strf"); le(168, 40, 4)
    le(172, 40, 4); le(176, w, 4); le(180, h, 4)
    le(184, 1, 2); le(186, 24, 2); le(192, fs, 4) // biCompression 0 = BI_RGB
    ascii(212, "LIST"); le(216, moviSize, 4); ascii(220, "movi")
    val shotLen = (4 + id % 3).toInt
    var f = 0
    while (f < nf) {
      val off = 224 + f * step
      ascii(off, "00db"); le(off + 4, fs, 4)
      // scene path: the per-(shot, channel) base is constant across the
      // frame — hoist its md5 out of the byte loop (bit-identical to
      // calling sceneByte per byte, which the ShotBoundarySpec pins)
      val bases = if (scene) Array.tabulate(3)(c =>
        md5Mod(s"scene:$id:${f / shotLen}:$c", 200L)) else null
      var i = 0
      while (i < fs) {
        // DWORD row padding positions stay zero, as real writers emit
        if (i % stride < w * 3) b(off + 8 + i) =
          if (scene)
            (bases((i % stride) % 3) + md5Mod(s"avin:$id:$f:$i", 24L)).toByte
          else pixelByte(id, f, i)
        i += 1
      }
      f += 1
    }
    b
  }
}

/** [[AviDibBytes]] with SCENE-STRUCTURED pixel content — the planted
  * ground truth for the shot-boundary gate (q302): identical canonical
  * container and DIB raster contract, but pixels follow
  * `AviDibBytes.sceneByte` (per-(shot, channel) md5 base in [0,200) +
  * per-byte md5 noise in [0,24), shots of `4 + id % 3` frames), so
  * frame-mean jumps mark the true cuts and both the bytes and the
  * expected detection outcome have ANSI-SQL closed forms.
  * [[AviFrameMeans]] decodes the output unchanged — the detector never
  * sees the generator. */
case class AviSceneBytes(w: Expression, h: Expression, nFrames: Expression,
    usPerFrame: Expression, docId: Expression) extends QuinaryExpression {

  override def children: Seq[Expression] =
    Seq(w, h, nFrames, usPerFrame, docId)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(w, h, nFrames, usPerFrame).forall(_.dataType.isInstanceOf[IntegerType]) &&
        docId.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_scene_bytes requires (int w, int h, int nFrames, " +
        s"int usPerFrame, long docId), got ${children.map(_.dataType).mkString(", ")}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avi_scene_bytes"

  override def nullSafeEval(wv: Any, hv: Any, nf: Any, us: Any,
      id: Any): Any =
    AviDibBytes.buildScene(wv.asInstanceOf[Int], hv.asInstanceOf[Int],
      nf.asInstanceOf[Int], us.asInstanceOf[Int], id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (wv, hv, nf, us, id) =>
      s"${ev.value} = graft.expressions.AviDibBytes.buildScene($wv, $hv, $nf, $us, $id);")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviSceneBytes =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4))
}

case class AviFrameMeans(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_avi_frames requires a binary input, got $t")
  }
  override def dataType: DataType = AviFrameMeans.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frames"

  override def nullSafeEval(input: Any): Any =
    AviFrameMeans.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.AviFrameMeans.decode($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AviFrameMeans =
    copy(child = newChild)
}

object AviFrameMeans {
  val frameSchema: StructType = StructType(Seq(
    StructField("frame", IntegerType, nullable = false),
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

  /** Full demux+decode → stats row, or null for any non-conforming
    * payload. Public + static-shaped so generated code can call it. */
  def decode(avi: Array[Byte]): InternalRow = {
    if (avi == null || avi.length < 224) return null
    // container grammar: canonical layout's spec'd offsets — avih data
    // 32..87, strh data 108..163, strf data 172..211, movi frames 224+
    if (!(magic(avi, 0, "RIFF") && magic(avi, 8, "AVI ") &&
        magic(avi, 12, "LIST") && magic(avi, 20, "hdrl") &&
        magic(avi, 24, "avih") && magic(avi, 88, "LIST") &&
        magic(avi, 96, "strl") && magic(avi, 100, "strh") &&
        magic(avi, 108, "vids") && magic(avi, 164, "strf") &&
        magic(avi, 212, "LIST") && magic(avi, 220, "movi"))) return null
    if (leU(avi, 168, 4) != 40) return null  // BITMAPINFOHEADER size
    if (leU(avi, 184, 2) != 1) return null   // biPlanes
    if (leU(avi, 186, 2) != 24) return null  // biBitCount: RGB24
    if (leU(avi, 188, 4) != 0) return null   // biCompression: BI_RGB
    // strf governs the frame layout (not avih); fps from strh
    val w = leU(avi, 176, 4)
    val h = leU(avi, 180, 4)
    val scale = leU(avi, 128, 4)
    val rate = leU(avi, 132, 4)
    val nf = leU(avi, 140, 4)
    if (w <= 0 || h <= 0 || nf <= 0 || scale <= 0) return null
    val stride = w * 3 + ((4 - (w * 3) % 4) % 4)
    val fs = stride * h
    val step = 8 + fs + fs % 2
    // exact-length check also bounds nf by the actual payload size —
    // an adversarial header cannot drive the loops past the array
    if (avi.length.toLong != 224L + nf * step) return null
    val wi = w.toInt
    val hi = h.toInt
    val stridei = stride.toInt
    val npix = (wi * hi).toDouble
    val frames = new Array[Any](nf.toInt)
    var f = 0
    while (f < nf) {
      val off = 224 + f * step.toInt
      if (!magic(avi, off, "00db") || leU(avi, off + 4, 4) != fs) return null
      // bottom-up row order is mean-invariant: walk rows linearly
      var sb = 0L; var sg = 0L; var sr = 0L
      var r = 0
      while (r < hi) {
        var base = off + 8 + r * stridei
        var x = 0
        while (x < wi) {
          sb += avi(base) & 0xff
          sg += avi(base + 1) & 0xff
          sr += avi(base + 2) & 0xff
          base += 3
          x += 1
        }
        r += 1
      }
      frames(f) = new GenericInternalRow(Array[Any](f,
        round4(sb / npix), round4(sg / npix), round4(sr / npix)))
      f += 1
    }
    new GenericInternalRow(Array[Any](wi, hi, nf,
      round4(rate.toDouble / scale.toDouble), new GenericArrayData(frames)))
  }
}

/** Two-stream INTERLEAVED AVI — the container grammar real capture
  * files actually use: `LIST hdrl` carries `avih` plus TWO `LIST strl`
  * blocks (video 'vids'/'DIB ' with its BITMAPINFOHEADER, audio
  * 'auds'/PCM with its 16-byte PCMWAVEFORMAT — wFormatTag=1, mono,
  * 16-bit, nBlockAlign=2), and `LIST movi` alternates one `00db` DIB
  * frame with one `01wb` PCM chunk per frame interval (the stream
  * number in the chunk fourcc IS the demux key). Closed forms: pixel
  * bytes keep [[AviDibBytes]]'s `md5("avi:<id>:<f>:<i>")` convention
  * verbatim; audio samples are int16 LE from
  * `md5("avipcm:<id>:<f>:<j>") % 65536` two's-complemented — the
  * q134 PCM convention keyed per frame — so BOTH decoded signals are
  * oracle-checkable in ANSI SQL.
  *
  * [[AviInterleavedDecode]] demuxes by walking the alternating chunk
  * grammar (validating every fourcc, both stream headers, the
  * PCMWAVEFORMAT consistency rules avgBytes=2·rate and
  * dwLength=nf·samplesPerFrame, and the exact total length), then
  * decodes per interval: per-channel pixel means from the DIB raster
  * AND RMS/peak from the PCM samples. One codegen'd static call, plan
  * size O(1) — born on the layer q140's postmortem mandates for
  * generator-fed byte decoders.
  */
case class AviInterleavedBytes(w: Expression, h: Expression,
    nFrames: Expression, usPerFrame: Expression, sampleRate: Expression,
    samplesPerFrame: Expression, docId: Expression)
    extends SeptenaryExpression {

  override def children: Seq[Expression] =
    Seq(w, h, nFrames, usPerFrame, sampleRate, samplesPerFrame, docId)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(w, h, nFrames, usPerFrame, sampleRate, samplesPerFrame)
        .forall(_.dataType.isInstanceOf[IntegerType]) &&
        docId.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_av_bytes requires (int w, int h, int nFrames, " +
        "int usPerFrame, int sampleRate, int samplesPerFrame, long docId), " +
        s"got ${children.map(_.dataType).mkString(", ")}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avi_av_bytes"

  override def nullSafeEval(wv: Any, hv: Any, nf: Any, us: Any,
      rate: Any, spf: Any, id: Option[Any]): Any =
    AviInterleavedBytes.build(wv.asInstanceOf[Int], hv.asInstanceOf[Int],
      nf.asInstanceOf[Int], us.asInstanceOf[Int], rate.asInstanceOf[Int],
      spf.asInstanceOf[Int], id.get.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (wv, hv, nf, us, rate, spf, id) =>
      s"${ev.value} = graft.expressions.AviInterleavedBytes.build(" +
        s"$wv, $hv, $nf, $us, $rate, $spf, ${id.get});")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviInterleavedBytes =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4), newChildren(5), newChildren(6))
}

object AviInterleavedBytes {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** int16 PCM sample as its unsigned two's-complement bit pattern:
    * `md5Int("avipcm:id:f:j", 8) % 65536` — the q134 "pcm:" closed
    * form, keyed per (doc, frame, sample-in-frame). */
  private[expressions] def sampleBits(id: Long, f: Int, j: Int): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s"avipcm:$id:$f:$j".getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % 65536L).toInt
  }

  /** Public + static-shaped so generated code can call it. */
  def build(w: Int, h: Int, nf: Int, us: Int, rate: Int, spf: Int,
      id: Long): Array[Byte] = {
    require(w > 0 && h > 0 && nf > 0 && us > 0 && rate > 0 && spf > 0,
      s"avi params out of range: ${w}x$h, $nf frames, $us us, $rate Hz, $spf spf")
    val stride = w * 3 + ((4 - (w * 3) % 4) % 4)
    val fs = stride * h
    val ab = 2 * spf
    require((fs.toLong + ab) * nf <= (1 << 22),
      s"avi payload out of range: ($fs+$ab) x $nf frames")
    val vstep = 8 + fs + (fs & 1)
    val astep = 8 + ab + (ab & 1)
    val moviSize = 4 + nf * (vstep + astep)
    val b = new Array[Byte](320 + moviSize)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { b(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le(off: Int, v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) { b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    ascii(0, "RIFF"); le(4, 312L + moviSize, 4); ascii(8, "AVI ")
    // hdrl payload: 'hdrl' + avih(64) + video strl(124) + audio strl(100)
    ascii(12, "LIST"); le(16, 292, 4); ascii(20, "hdrl")
    ascii(24, "avih"); le(28, 56, 4)
    le(32, us, 4); le(48, nf, 4); le(56, 2, 4) // TWO streams
    le(60, fs, 4); le(64, w, 4); le(68, h, 4)
    // video strl — byte-identical layout to AviDibBytes
    ascii(88, "LIST"); le(92, 116, 4); ascii(96, "strl")
    ascii(100, "strh"); le(104, 56, 4)
    ascii(108, "vids"); ascii(112, "DIB ")
    le(128, us, 4); le(132, 1000000, 4); le(140, nf, 4); le(144, fs, 4)
    le(160, w, 2); le(162, h, 2)
    ascii(164, "strf"); le(168, 40, 4)
    le(172, 40, 4); le(176, w, 4); le(180, h, 4)
    le(184, 1, 2); le(186, 24, 2); le(192, fs, 4)
    // audio strl: strh 'auds' (scale=1, rate=Hz, length=total samples,
    // sampleSize=2) + strf PCMWAVEFORMAT (16 bytes)
    ascii(212, "LIST"); le(216, 92, 4); ascii(220, "strl")
    ascii(224, "strh"); le(228, 56, 4)
    ascii(232, "auds")
    le(252, 1, 4); le(256, rate, 4); le(264, nf.toLong * spf, 4)
    le(268, ab, 4); le(276, 2, 4)
    ascii(288, "strf"); le(292, 16, 4)
    le(296, 1, 2); le(298, 1, 2); le(300, rate, 4)
    le(304, 2L * rate, 4); le(308, 2, 2); le(310, 16, 2)
    ascii(312, "LIST"); le(316, moviSize, 4); ascii(320, "movi")
    var f = 0
    while (f < nf) {
      val voff = 324 + f * (vstep + astep)
      ascii(voff, "00db"); le(voff + 4, fs, 4)
      var i = 0
      while (i < fs) {
        if (i % stride < w * 3) b(voff + 8 + i) = AviDibBytes.pixelByte(id, f, i)
        i += 1
      }
      val aoff = voff + vstep
      ascii(aoff, "01wb"); le(aoff + 4, ab, 4)
      var j = 0
      while (j < spf) {
        val bits = sampleBits(id, f, j)
        b(aoff + 8 + 2 * j) = (bits & 0xff).toByte
        b(aoff + 8 + 2 * j + 1) = ((bits >> 8) & 0xff).toByte
        j += 1
      }
      f += 1
    }
    b
  }
}

case class AviInterleavedDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_avi_av_decode requires a binary input, got $t")
  }
  override def dataType: DataType = AviInterleavedDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_av_decode"

  override def nullSafeEval(input: Any): Any =
    AviInterleavedDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.AviInterleavedDecode.decode($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): AviInterleavedDecode = copy(child = newChild)
}

object AviInterleavedDecode {
  val frameSchema: StructType = StructType(Seq(
    StructField("frame", IntegerType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", LongType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fps", DoubleType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("frames", ArrayType(frameSchema, containsNull = false),
      nullable = false)))

  private def round4(x: Double): Double =
    math.floor(x * 1e4 + 0.5) / 1e4

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

  /** Full two-stream demux+decode → stats row, or null for any
    * non-conforming payload. Public + static-shaped so generated code
    * can call it. */
  def decode(avi: Array[Byte]): InternalRow = {
    if (avi == null || avi.length < 324) return null
    if (!(magic(avi, 0, "RIFF") && magic(avi, 8, "AVI ") &&
        magic(avi, 12, "LIST") && magic(avi, 20, "hdrl") &&
        magic(avi, 24, "avih") && magic(avi, 88, "LIST") &&
        magic(avi, 96, "strl") && magic(avi, 100, "strh") &&
        magic(avi, 108, "vids") && magic(avi, 164, "strf") &&
        magic(avi, 212, "LIST") && magic(avi, 220, "strl") &&
        magic(avi, 224, "strh") && magic(avi, 232, "auds") &&
        magic(avi, 288, "strf") && magic(avi, 312, "LIST") &&
        magic(avi, 320, "movi"))) return null
    if (leU(avi, 168, 4) != 40) return null   // BITMAPINFOHEADER size
    if (leU(avi, 184, 2) != 1) return null    // biPlanes
    if (leU(avi, 186, 2) != 24) return null   // biBitCount: RGB24
    if (leU(avi, 188, 4) != 0) return null    // biCompression: BI_RGB
    if (leU(avi, 292, 4) != 16) return null   // PCMWAVEFORMAT size
    if (leU(avi, 296, 2) != 1) return null    // wFormatTag: PCM
    if (leU(avi, 298, 2) != 1) return null    // mono
    if (leU(avi, 308, 2) != 2) return null    // nBlockAlign
    if (leU(avi, 310, 2) != 16) return null   // 16-bit
    val w = leU(avi, 176, 4)
    val h = leU(avi, 180, 4)
    val scale = leU(avi, 128, 4)
    val vrate = leU(avi, 132, 4)
    val nf = leU(avi, 140, 4)
    val arate = leU(avi, 300, 4)
    if (w <= 0 || h <= 0 || nf <= 0 || scale <= 0 || arate <= 0) return null
    // audio stream-header / format cross-checks
    if (leU(avi, 252, 4) != 1) return null          // strh dwScale
    if (leU(avi, 256, 4) != arate) return null      // strh dwRate == strf rate
    if (leU(avi, 304, 4) != 2 * arate) return null  // avgBytes = 2·rate
    val totalSamples = leU(avi, 264, 4)             // strh dwLength
    if (totalSamples <= 0 || totalSamples % nf != 0) return null
    val spf = (totalSamples / nf).toInt
    val ab = 2 * spf
    val stride = w * 3 + ((4 - (w * 3) % 4) % 4)
    val fs = stride * h
    val vstep = 8 + fs + fs % 2
    val astep = 8 + ab + (ab & 1)
    if (avi.length.toLong != 324L + nf * (vstep + astep)) return null
    val wi = w.toInt
    val hi = h.toInt
    val stridei = stride.toInt
    val npix = (wi * hi).toDouble
    val frames = new Array[Any](nf.toInt)
    var f = 0
    while (f < nf) {
      val voff = 324 + f * (vstep + astep).toInt
      if (!magic(avi, voff, "00db") || leU(avi, voff + 4, 4) != fs) return null
      var sb = 0L; var sg = 0L; var sr = 0L
      var r = 0
      while (r < hi) {
        var base = voff + 8 + r * stridei
        var x = 0
        while (x < wi) {
          sb += avi(base) & 0xff
          sg += avi(base + 1) & 0xff
          sr += avi(base + 2) & 0xff
          base += 3
          x += 1
        }
        r += 1
      }
      val aoff = voff + vstep.toInt
      if (!magic(avi, aoff, "01wb") || leU(avi, aoff + 4, 4) != ab) return null
      var sumSq = 0L; var peak = 0L
      var j = 0
      while (j < spf) {
        val lo = avi(aoff + 8 + 2 * j) & 0xff
        val hiB = avi(aoff + 8 + 2 * j + 1)
        val s = (hiB << 8) | lo // sign carried by the high byte
        sumSq += s.toLong * s
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        j += 1
      }
      frames(f) = new GenericInternalRow(Array[Any](f,
        round4(sb / npix), round4(sg / npix), round4(sr / npix),
        spf.toLong, round4(math.sqrt(sumSq.toDouble / spf)), peak))
      f += 1
    }
    new GenericInternalRow(Array[Any](wi, hi, nf,
      round4(vrate.toDouble / scale.toDouble), arate,
      new GenericArrayData(frames)))
  }
}
