package graft.expressions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real GIF87a encode/decode as native expressions — the multimodal
  * family's first FROM-SCRATCH compression codec. PNG (q145) exercises
  * chunk grammar + CRC but delegates compression to the JDK's zlib;
  * GIF's image data is LZW (Welch '84), which `java.util.zip` does not
  * provide — so [[GifBytes]] carries a complete LZW compressor
  * (variable code width 3→12 bits, LSB-first packing, dictionary reset
  * at 4096) and [[GifDecode]] the matching decompressor including the
  * KwKwK self-referential case. The spec cross-checks our bytes
  * against `javax.imageio`'s independent GIF reader, so the encoder is
  * pinned to the published format, not merely to our own decoder.
  *
  * [[GifBytes]] builds: "GIF87a", logical screen descriptor, a fixed
  * 4-color global color table, one image descriptor, the LZW stream
  * (min code size 2 — clear 4, EOI 5, first free 6) in ≤255-byte
  * sub-blocks, trailer. Pixel INDEX i of doc d is
  * `md5Int("gif:d:i", 8) % 4` (the PPM/PNG convention), so image
  * content has an ANSI-SQL closed form while the LZW payload itself
  * does not.
  *
  * [[GifDecode]] walks the structure strictly (magic, descriptor
  * flags, sub-block framing, EOI, trailer, exact pixel count), LZW-
  * decodes, and emits the per-index histogram plus
  * `md5(idx0,idx1,…)` over the comma-joined index stream — the digest
  * the oracle reproduces from the closed form. NULL on any
  * non-conforming payload.
  */
case class GifBytes(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second).forall(_.dataType.isInstanceOf[IntegerType]) &&
        third.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_gif_bytes requires (int width, int height, long docId), got " +
        Seq(first, second, third).map(_.dataType).mkString(", "))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gif_bytes"

  override def nullSafeEval(w: Any, h: Any, id: Any): Any =
    GifBytes.build(w.asInstanceOf[Int], h.asInstanceOf[Int],
      id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, id) =>
      s"${ev.value} = graft.expressions.GifBytes.build($w, $h, $id);")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): GifBytes = copy(f, s, t)
}

object GifBytes {
  /** Fixed 4-color global palette (distinct channels so the ImageIO
    * cross-check is unambiguous). */
  val palette: Array[Array[Int]] =
    Array.tabulate(4)(k => Array(k * 80, 255 - k * 80, (k * 37) % 256))

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** md5-derived palette index: md5Int("gif:id:i", 8) % 4. */
  def pixelIndex(id: Long, i: Int): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s"gif:$id:$i".getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % 4L).toInt
  }

  private final val MinCode = 2
  private final val Clear = 1 << MinCode   // 4
  private final val Eoi = Clear + 1        // 5

  /** LSB-first variable-width bit packer. */
  private final class BitPacker {
    private val out = new ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= (code.toLong << nbits)
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
  }

  /** Standard GIF LZW compress of a 2-bit index stream. */
  private def lzwCompress(idx: Array[Byte]): Array[Byte] = {
    val packer = new BitPacker
    var codeSize = MinCode + 1
    var next = Eoi + 1
    // dictionary: (prefix code << 2 | suffix symbol) -> code; boxed
    // Integer values so an absent key is null, not an unboxed 0
    var dict = new java.util.HashMap[Integer, Integer]()
    def key(prefix: Int, k: Int): Integer = Integer.valueOf((prefix << 2) | k)
    packer.put(Clear, codeSize)
    var cur = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val k = idx(i) & 0xff
      val hit = dict.get(key(cur, k))
      if (hit != null) {
        cur = hit.intValue
      } else {
        packer.put(cur, codeSize)
        if (next < 4096) {
          dict.put(key(cur, k), Integer.valueOf(next))
          next += 1
          // the decoder learns each entry one code LATER than the
          // encoder creates it, so the encoder grows the code width at
          // 2^cs + 1 where the decoder grows at 2^cs — the published
          // GIF pairing (off by one is the classic LZW desync bug)
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else {
          // table full: emit clear, reset
          packer.put(Clear, codeSize)
          dict = new java.util.HashMap[Integer, Integer]()
          codeSize = MinCode + 1
          next = Eoi + 1
        }
        cur = k
      }
      i += 1
    }
    packer.put(cur, codeSize)
    // the decoder adds a dictionary entry for this FINAL data code too
    // (it cannot know no more data follows) and applies early-change
    // width growth when that entry lands exactly on 2^cs — so EOI must
    // be written at the GROWN width or the decoder reads it desynced.
    // (Found at sf0.1: exactly 2 of 5000 streams ended on the
    // boundary — ids 1144/4290, both 4x4 — and decoded to null;
    // regression-pinned in GifCodecSpec.)
    if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
    packer.put(Eoi, codeSize)
    packer.finish()
  }

  /** Public + static-shaped so generated code can call it. */
  def build(w: Int, h: Int, id: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 20),
      s"gif dims out of range: ${w}x$h")
    val n = w * h
    val idx = new Array[Byte](n)
    var i = 0
    while (i < n) { idx(i) = pixelIndex(id, i).toByte; i += 1 }
    val out = new ByteArrayOutputStream(n / 2 + 64)
    out.write("GIF87a".getBytes("US-ASCII"), 0, 6)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    // GCT present, color resolution 2 bits (field 1), GCT size 2^(1+1)=4
    out.write(0x80 | (1 << 4) | 0x01)
    out.write(0)  // background color index
    out.write(0)  // pixel aspect ratio
    palette.foreach(c => { out.write(c(0)); out.write(c(1)); out.write(c(2)) })
    out.write(0x2c)                // image separator
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)                   // no LCT, no interlace
    out.write(MinCode)             // LZW minimum code size
    val z = lzwCompress(idx)
    var off = 0
    while (off < z.length) {
      val blk = math.min(255, z.length - off)
      out.write(blk)
      out.write(z, off, blk)
      off += blk
    }
    out.write(0)                   // block terminator
    out.write(0x3b)                // trailer
    out.toByteArray
  }
}

case class GifDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gif_decode requires a binary input, got $t")
  }
  override def dataType: DataType = GifDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_decode"

  override def nullSafeEval(input: Any): Any =
    GifDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.GifDecode.decode($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GifDecode =
    copy(child = newChild)
}

object GifDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("gct_size", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("c0", LongType, nullable = false),
    StructField("c1", LongType, nullable = false),
    StructField("c2", LongType, nullable = false),
    StructField("c3", LongType, nullable = false),
    StructField("idx_md5", StringType, nullable = false)))

  private final val MinCode = 2
  private final val Clear = 1 << MinCode
  private final val Eoi = Clear + 1

  /** Full decode → stats row, or null for any non-conforming payload.
    * Public + static-shaped so generated code can call it. */
  def decode(gif: Array[Byte]): InternalRow = {
    val d = decodeIndices(gif)
    if (d == null) null
    else statsRow(d._1, d._2, d._3, d._4)
  }

  /** Histogram + index-stream digest row over a raster — shared by
    * [[decode]] and [[GifResize]] so both emit the same facts. */
  private[expressions] def statsRow(w: Int, h: Int, gctSize: Int,
      idx: Array[Byte]): InternalRow = {
    val n = idx.length
    val counts = new Array[Long](4)
    val sb = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) {
      val v = idx(i) & 0xff
      if (v > 3) return null
      counts(v) += 1
      if (i > 0) sb.append(',')
      sb.append(v)
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(sb.toString.getBytes("UTF-8"))
    val hex = dig.map(b => f"${b & 0xff}%02x").mkString
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](w, h, gctSize, n.toLong, counts(0), counts(1), counts(2),
        counts(3), UTF8String.fromString(hex)))
  }

  /** Structure walk + LZW decode → (w, h, gctSize, indices), null on
    * any non-conforming payload. */
  private[expressions] def decodeIndices(gif: Array[Byte])
      : (Int, Int, Int, Array[Byte]) = {
    if (gif == null || gif.length < 13 + 12 + 10 + 1 + 2) return null
    if (new String(gif, 0, 6, "US-ASCII") != "GIF87a") return null
    def le16(off: Int): Int = (gif(off) & 0xff) | ((gif(off + 1) & 0xff) << 8)
    val sw = le16(6); val sh = le16(8)
    val packed = gif(10) & 0xff
    if ((packed & 0x80) == 0) return null          // GCT required
    val gctBits = (packed & 0x07) + 1
    val gctSize = 1 << gctBits
    if (gctSize != 4) return null                  // this profile: 4 colors
    var pos = 13 + gctSize * 3
    if (pos >= gif.length || (gif(pos) & 0xff) != 0x2c) return null
    val w = le16(pos + 5); val h = le16(pos + 7)
    if (w != sw || h != sh || w <= 0 || h <= 0 ||
      w.toLong * h > (1 << 20)) return null
    if ((gif(pos + 9) & 0xff) != 0) return null    // no LCT/interlace
    pos += 10
    if ((gif(pos) & 0xff) != MinCode) return null
    pos += 1
    // concatenate sub-blocks
    val z = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (pos >= gif.length) return null
      val blk = gif(pos) & 0xff
      pos += 1
      if (blk == 0) done = true
      else {
        if (pos + blk > gif.length) return null
        z.write(gif, pos, blk)
        pos += blk
      }
    }
    // trailer must close the file exactly
    if (pos + 1 != gif.length || (gif(pos) & 0xff) != 0x3b) return null
    val data = z.toByteArray
    val n = w * h
    val idx = new Array[Byte](n)
    var out = 0
    // LZW decode: prefix/suffix tables, KwKwK handling, width growth
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var codeSize = MinCode + 1
    var next = Eoi + 1
    var prev = -1
    var acc = 0L; var nbits = 0; var bi = 0
    var eoiSeen = false
    val stack = new Array[Int](4096)
    while (!eoiSeen) {
      while (nbits < codeSize && bi < data.length) {
        acc |= (data(bi) & 0xffL) << nbits
        nbits += 8; bi += 1
      }
      if (nbits < codeSize) return null            // truncated stream
      val code = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize; nbits -= codeSize
      if (code == Clear) {
        codeSize = MinCode + 1; next = Eoi + 1; prev = -1
      } else if (code == Eoi) {
        eoiSeen = true
      } else if (prev == -1) {
        if (code >= Clear) return null
        if (out >= n) return null
        idx(out) = code.toByte; out += 1
        prev = code
      } else {
        if (code > next) return null
        var sp = 0
        var c = if (code == next) prev else code   // KwKwK: expand prev
        val kwkwk = code == next
        while (c >= Clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val first = c
        // emit first symbol, then unwind the stack
        if (out + sp + 1 + (if (kwkwk) 1 else 0) > n) return null
        idx(out) = first.toByte; out += 1
        while (sp > 0) { sp -= 1; idx(out) = stack(sp).toByte; out += 1 }
        if (kwkwk) { idx(out) = first.toByte; out += 1 }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (out != n) return null                      // exact pixel count
    (w, h, gctSize, idx)
  }
}

/** Nearest-neighbor resize of a decoded GIF raster —
  * `graft_gif_resize(binary, w2, h2)`: decode (full structure walk +
  * LZW), then sample `src(⌊x·w/w2⌋, ⌊y·h/h2⌋)` for each destination
  * pixel — the integer-exact NN mapping whose output therefore has the
  * same md5 closed form as the source indices under an index remap, so
  * the RESIZED raster digest is oracle-verifiable end-to-end. The
  * image-pipeline stage (decode → resample → re-featurize) on opaque
  * binary columns, all native, one row in/one struct out. */
case class GifResize(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType.isInstanceOf[BinaryType] &&
        Seq(second, third).forall(_.dataType.isInstanceOf[IntegerType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_gif_resize requires (binary, int w2, int h2), got " +
        Seq(first, second, third).map(_.dataType).mkString(", "))
  override def dataType: DataType = GifDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_resize"

  override def nullSafeEval(g: Any, w2: Any, h2: Any): Any =
    GifResize.resize(g.asInstanceOf[Array[Byte]],
      w2.asInstanceOf[Int], h2.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, w2, h2) => s"""
       |${ev.value} = graft.expressions.GifResize.resize($g, $w2, $h2);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): GifResize = copy(f, s, t)
}

object GifResize {
  /** Public + static-shaped so generated code can call it. */
  def resize(gif: Array[Byte], w2: Int, h2: Int): InternalRow = {
    if (w2 <= 0 || h2 <= 0 || w2.toLong * h2 > (1 << 20)) return null
    val d = GifDecode.decodeIndices(gif)
    if (d == null) return null
    val (w, h, gctSize, idx) = d
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * h / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * w / w2).toInt
        out(y * w2 + x) = idx(sy * w + sx)
        x += 1
      }
      y += 1
    }
    GifDecode.statsRow(w2, h2, gctSize, out)
  }
}
