package graft.expressions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Real PNG (RFC 2083) encode/decode as native expressions — the first
  * COMPRESSED codec in the multimodal family. WAV/PPM/AVI-DIB decode
  * (q105/q130/q135/q140) are pure byte arithmetic and ride builtin
  * column compositions; PNG's IDAT stream is zlib-DEFLATE, which no
  * builtin composition can express, so this pair drops to the
  * expression layer and uses the JDK's zlib (`java.util.zip`) — still
  * zero added dependencies.
  *
  * [[PngBytes]] builds a spec-complete 8-bit RGB (color type 2) PNG:
  * signature, IHDR, the filtered+deflated scanline stream split across
  * multiple IDAT chunks, IEND, CRC32 on every chunk. Scanline `r` uses
  * filter type `r % 5`, so every decode exercises all five PNG filters
  * (None/Sub/Up/Average/Paeth). Pixel bytes are md5-derived per
  * (doc, raster index) — `md5Int("png:<id>:<i>", 8) % 256`, the
  * [[graft.operators.Multimodal.ppmBytes]] convention — so image
  * CONTENT has an ANSI-SQL closed form even though the payload bytes
  * (deflate output) are not themselves oracle-stable.
  *
  * [[PngDecode]] is a real decoder, not a closed-form restatement: it
  * validates the signature, walks the chunk grammar verifying every
  * CRC32, parses IHDR, concatenates and INFLATES the IDAT stream,
  * un-filters each scanline (all five filter types, bpp=3), and only
  * then computes per-channel means from the reconstructed pixels.
  * Returns NULL for any non-conforming payload (bad magic/CRC/filter
  * type/inflated length). An encode bug, a filter bug, or an offset
  * bug all go red on the means against the generator's closed form.
  */
case class PngBytes(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, fourth).forall(_.dataType.isInstanceOf[IntegerType]) &&
        third.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_png_bytes requires (int width, int height, long docId, " +
        "int brightness), got " +
        Seq(first, second, third, fourth).map(_.dataType).mkString(", "))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_png_bytes"

  override def nullSafeEval(w: Any, h: Any, id: Any, d: Any): Any =
    PngBytes.build(w.asInstanceOf[Int], h.asInstanceOf[Int],
      id.asInstanceOf[Long], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, id, d) =>
      s"${ev.value} = graft.expressions.PngBytes.build($w, $h, $id, $d);")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): PngBytes =
    copy(f, s, t, q)
}

object PngBytes {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** md5-derived pixel byte: first 8 hex digits of md5("png:id:i") as
    * an unsigned int, mod 256 — `TextFunctions.md5Int(s, 8) % 256`. */
  private def pixelByte(id: Long, i: Int): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s"png:$id:$i".getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % 256L).toInt
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def be(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val t = typ.getBytes("US-ASCII")
    out.write(be(data.length.toLong), 0, 4)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    out.write(be(crc.getValue), 0, 4)
  }

  /** Public + static-shaped so generated code can call it. `delta` is
    * a clamped brightness shift per channel byte — min(255, px+delta)
    * (delta >= 0) / max(0, px+delta) (delta < 0) — the photometric
    * perturbation used to PLANT near-duplicate images for the
    * perceptual-hash queries: same md5 content, different bytes. */
  def build(w: Int, h: Int, id: Long, delta: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 22),
      s"png dims out of range: ${w}x$h")
    val bpp = 3
    val stride = w * bpp
    // raw pixels, raster order
    val raw = Array.ofDim[Byte](h, stride)
    var r = 0
    while (r < h) {
      var x = 0
      while (x < stride) {
        val v = pixelByte(id, r * stride + x) + delta
        raw(r)(x) = math.max(0, math.min(255, v)).toByte
        x += 1
      }
      r += 1
    }
    encode(w, h, raw)
  }

  /** Filter + deflate + chunk-write RGB scanlines into a
    * spec-complete PNG — the encode back-half shared by [[build]]
    * (md5-generated pixels) and [[PngResize]] (resampled pixels). */
  private[expressions] def encode(w: Int, h: Int,
      raw: Array[Array[Byte]]): Array[Byte] = {
    val bpp = 3
    val stride = w * bpp
    // filter: scanline r uses type r % 5 — decode exercises them all
    val scan = new Array[Byte](h * (1 + stride))
    var r = 0
    while (r < h) {
      val ft = r % 5
      val base = r * (1 + stride)
      scan(base) = ft.toByte
      var x = 0
      while (x < stride) {
        val rv = raw(r)(x) & 0xff
        val left = if (x >= bpp) raw(r)(x - bpp) & 0xff else 0
        val up = if (r > 0) raw(r - 1)(x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp) raw(r - 1)(x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        scan(base + 1 + x) = ((rv - pred) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    // zlib-deflate the scanline stream
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    defl.setInput(scan); defl.finish()
    val zout = new ByteArrayOutputStream(scan.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      zout.write(buf, 0, n)
    }
    defl.end()
    val z = zout.toByteArray
    val out = new ByteArrayOutputStream(z.length + 128)
    out.write(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte), 0, 8)
    val ihdr = new ByteArrayOutputStream(13)
    def be(v: Int): Unit = {
      ihdr.write((v >> 24) & 0xff); ihdr.write((v >> 16) & 0xff)
      ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff)
    }
    be(w); be(h)
    ihdr.write(8); ihdr.write(2)  // bit depth 8, color type 2 (RGB)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive, none
    chunk(out, "IHDR", ihdr.toByteArray)
    // split IDAT so decoders must concatenate the stream (spec-legal
    // at any boundary)
    var off = 0
    while (off < z.length) {
      val n = math.min(50, z.length - off)
      chunk(out, "IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += n
    }
    chunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }
}

case class PngDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_png_decode requires a binary input, got $t")
  }
  override def dataType: DataType = PngDecode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_decode"

  override def nullSafeEval(input: Any): Any =
    PngDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.PngDecode.decode($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngDecode =
    copy(child = newChild)
}

object PngDecode {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false),
    StructField("n_idat", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  private def round4(x: Double): Double =
    math.floor(x * 1e4 + 0.5) / 1e4  // MysqlFunctions.oracleRound(·, 4)

  private def beInt(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Decoded image: dims, IDAT chunk count, and the un-filtered RGB
    * scanlines (`rows(r)(x)`, stride = 3·w). The shared product of
    * [[decodeRaw]], consumed by both the stats row ([[decode]]) and
    * the perceptual hash ([[PngDhash]]). */
  private[expressions] final case class PngRaw(
      w: Int, h: Int, nIdat: Int, rows: Array[Array[Byte]])

  /** Full decode → stats row, or null for any non-conforming payload.
    * Public + static-shaped so generated code can call it. */
  def decode(png: Array[Byte]): InternalRow = {
    val raw = decodeRaw(png)
    if (raw == null) return null
    val stride = raw.w * 3
    val sums = new Array[Long](3)
    var r = 0
    while (r < raw.h) {
      var x = 0
      while (x < stride) {
        sums(x % 3) += raw.rows(r)(x) & 0xff
        x += 1
      }
      r += 1
    }
    val npx = raw.w.toLong * raw.h
    new GenericInternalRow(Array[Any](raw.w, raw.h, 8, 2, raw.nIdat, npx,
      round4(sums(0).toDouble / npx), round4(sums(1).toDouble / npx),
      round4(sums(2).toDouble / npx)))
  }

  /** Chunk walk + CRC verify + inflate + un-filter → [[PngRaw]], or
    * null for any non-conforming payload. */
  private[expressions] def decodeRaw(png: Array[Byte]): PngRaw = {
    if (png == null || png.length < 8) return null
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((png(i) & 0xff) != sig(i)) return null; i += 1 }
    var pos = 8
    var w = -1; var h = -1; var bitDepth = -1; var colorType = -1
    var seenIhdr = false; var seenIend = false; var nIdat = 0
    val idat = new ByteArrayOutputStream()
    while (pos + 12 <= png.length && !seenIend) {
      val len = beInt(png, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > png.length) return null
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(png, pos + 4, 4 + len.toInt)
      if (crc.getValue != beInt(png, pos + 8 + len.toInt)) return null
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return null
          seenIhdr = true
          w = beInt(png, pos + 8).toInt; h = beInt(png, pos + 12).toInt
          bitDepth = png(pos + 16) & 0xff; colorType = png(pos + 17) & 0xff
          // compression 0, filter method 0, no interlace; dims bounded
          // (an adversarial header must not size executor allocations)
          if ((png(pos + 18) & 0xff) != 0 || (png(pos + 19) & 0xff) != 0 ||
            (png(pos + 20) & 0xff) != 0) return null
          if (w <= 0 || h <= 0 || w.toLong * h > (1 << 22)) return null
        case "IDAT" =>
          if (!seenIhdr) return null
          idat.write(png, pos + 8, len.toInt)
          nIdat += 1
        case "IEND" =>
          if (len != 0 || pos + 12 != png.length) return null
          seenIend = true
        case _ => () // ancillary chunks: CRC-checked above, skipped
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr || !seenIend || nIdat == 0) return null
    if (bitDepth != 8 || colorType != 2) return null // 8-bit RGB only
    val bpp = 3
    val stride = w * bpp
    val expect = h.toLong * (1 + stride)
    val scan = new Array[Byte](expect.toInt)
    val inf = new Inflater(false)
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < scan.length && !inf.finished()) {
        val n = inf.inflate(scan, got, scan.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
      // inflated stream must be EXACTLY h·(1+stride) bytes
      if (got != scan.length) return null
      val tail = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(tail) != 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // un-filter (RFC 2083 §6): recon = filt + pred, per scanline type
    val raw = Array.ofDim[Byte](h, stride)
    var r = 0
    while (r < h) {
      val base = r * (1 + stride)
      val ft = scan(base) & 0xff
      if (ft > 4) return null
      var x = 0
      while (x < stride) {
        val fv = scan(base + 1 + x) & 0xff
        val left = if (x >= bpp) raw(r)(x - bpp) & 0xff else 0
        val up = if (r > 0) raw(r - 1)(x) & 0xff else 0
        val ul = if (r > 0 && x >= bpp) raw(r - 1)(x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(r)(x) = ((fv + pred) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    PngRaw(w, h, nIdat, raw)
  }
}

/** `graft_png_dhash(png)` — perceptual difference-hash of a decoded
  * PNG, the image-dedup primitive: exact byte hashing (sha/md5) breaks
  * under ANY re-encode or photometric tweak, while dHash is stable
  * under brightness shifts and mild noise, so near-duplicate images
  * land within a small Hamming distance. Contract (pinned, so the
  * md5 closed form of the generator gives an ANSI-SQL oracle):
  *
  *  - sample a 9×8 grid by nearest neighbor: source pixel for grid
  *    (x, y) is (x·w/9, y·h/8), integer floor;
  *  - gray = r+g+b of the sampled pixel (sum, no division — order is
  *    all a comparison needs);
  *  - bit k = y·8+x (x in 0..7) is set iff gray(x,y) > gray(x+1,y);
  *  - the 64 bits are returned as four 16-bit bands b0..b3
  *    (b_j = bits [16j, 16j+16), little-endian within the band) —
  *    band-equality IS the LSH bucketing for the near-dup join, and
  *    keeping bands separate avoids 64-bit sign pitfalls in SQL.
  *
  * Null for any non-conforming payload, like [[PngDecode]].
  */
case class PngDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_png_dhash requires a binary input, got $t")
  }
  override def dataType: DataType = PngDhash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_dhash"

  override def nullSafeEval(input: Any): Any =
    PngDhash.dhash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.PngDhash.dhash($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngDhash =
    copy(child = newChild)
}

/** `graft_png_resize(png, w2, h2)` — real image resize: full decode
  * (chunk walk + CRC + inflate + un-filter), nearest-neighbor
  * resample (source pixel for output (x, y) is (x·w/w2, y·h/h2),
  * integer floor — the SAME floor convention as [[PngDhash]]'s grid),
  * re-encode through the shared [[PngBytes.encode]] back-half
  * (filter cycle + deflate + CRC chunks). The thumbnail/normalize
  * stage of an image pipeline; pairs with [[PngDhash]] to
  * demonstrate scale-robust near-dup detection. Null for any
  * non-conforming payload or non-positive dims.
  */
case class PngResize(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: BinaryType, _: IntegerType, _: IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_png_resize requires (binary, int, int), got ($a, $b, $c)")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_resize"

  override def nullSafeEval(png: Any, w2: Any, h2: Any): Any =
    PngResize.resize(png.asInstanceOf[Array[Byte]],
      w2.asInstanceOf[Int], h2.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, w, h) => s"""
       |${ev.value} = graft.expressions.PngResize.resize($p, $w, $h);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PngResize = copy(f, s, t)
}

object PngResize {
  /** Public + static-shaped so generated code can call it. */
  def resize(png: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    if (w2 <= 0 || h2 <= 0 || w2.toLong * h2 > (1 << 22)) return null
    val raw = PngDecode.decodeRaw(png)
    if (raw == null) return null
    val out = Array.ofDim[Byte](h2, w2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * raw.h / h2).toInt
      val srcRow = raw.rows(sy)
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * raw.w / w2).toInt
        out(y)(x * 3) = srcRow(sx * 3)
        out(y)(x * 3 + 1) = srcRow(sx * 3 + 1)
        out(y)(x * 3 + 2) = srcRow(sx * 3 + 2)
        x += 1
      }
      y += 1
    }
    PngBytes.encode(w2, h2, out)
  }
}

object PngDhash {
  val schema: StructType = StructType(Seq(
    StructField("b0", IntegerType, nullable = false),
    StructField("b1", IntegerType, nullable = false),
    StructField("b2", IntegerType, nullable = false),
    StructField("b3", IntegerType, nullable = false)))

  /** Public + static-shaped so generated code can call it. */
  def dhash(png: Array[Byte]): InternalRow = {
    val raw = PngDecode.decodeRaw(png)
    if (raw == null) return null
    // 9×8 nearest-neighbor grid of channel sums
    val gray = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      val sy = y * raw.h / 8
      val row = raw.rows(sy)
      var x = 0
      while (x < 9) {
        val sx = x * raw.w / 9
        val o = sx * 3
        gray(y)(x) = (row(o) & 0xff) + (row(o + 1) & 0xff) +
          (row(o + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val bands = new Array[Int](4)
    var k = 0
    while (k < 64) {
      val gy = k / 8
      val gx = k % 8
      if (gray(gy)(gx) > gray(gy)(gx + 1))
        bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    new GenericInternalRow(Array[Any](bands(0), bands(1), bands(2), bands(3)))
  }
}
