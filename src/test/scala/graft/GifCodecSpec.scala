package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{GifBytes, GifDecode}

/** GIF codec robustness. The gate (q182) proves decoded content equals
  * the md5 closed form; this spec covers what the oracle cannot:
  * (1) the encoder is pinned to the PUBLISHED format by decoding our
  * bytes with `javax.imageio`'s independent GIF reader and comparing
  * pixels against palette[closed-form index]; (2) the LZW dictionary
  * reset and KwKwK paths fire on adversarial inputs; (3) rejection
  * paths (truncation, bad trailer, junk). */
class GifCodecSpec extends AnyFunSuite {

  private def closedFormIdx(id: Long, n: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n) { i =>
      val d = md.digest(s"gif:$id:$i".getBytes("UTF-8"))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (v % 4L).toInt
    }
  }

  test("round-trip: decode recovers dims, histogram, and the full index digest") {
    val (w, h, id) = (16, 14, 42L)
    val gif = GifBytes.build(w, h, id)
    val row = GifDecode.decode(gif)
    assert(row != null)
    assert(row.getInt(0) == w && row.getInt(1) == h && row.getInt(2) == 4)
    assert(row.getLong(3) == w.toLong * h)
    val idx = closedFormIdx(id, w * h)
    val counts = idx.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- 0 to 3)
      assert(row.getLong(4 + k) == counts.getOrElse(k, 0L), s"count c$k")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(idx.mkString(",").getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(row.getString(8) == hex)
  }

  test("javax.imageio independently decodes our bytes to the same pixels") {
    val (w, h, id) = (15, 13, 7L)
    val gif = GifBytes.build(w, h, id)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img != null, "ImageIO must accept the GIF87a stream")
    assert(img.getWidth == w && img.getHeight == h)
    val idx = closedFormIdx(id, w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val pal = GifBytes.palette(idx(y * w + x))
      val want = 0xff000000 | (pal(0) << 16) | (pal(1) << 8) | pal(2)
      assert(rgb == want, s"pixel ($x,$y): got ${rgb.toHexString}, " +
        s"want ${want.toHexString} (idx ${idx(y * w + x)})")
    }
  }

  test("LZW survives dictionary growth across code widths and repeated runs") {
    // a 64x64 image has 4096 pixels: the 2-bit alphabet fills the
    // dictionary through several code-width bumps; KwKwK cases occur
    // naturally in md5 noise, and a constant image forces the
    // run-length extreme
    val big = GifBytes.build(64, 64, 3L)
    val row = GifDecode.decode(big)
    assert(row != null && row.getLong(3) == 4096L)
    val idx = closedFormIdx(3L, 4096)
    for (k <- 0 to 3)
      assert(row.getLong(4 + k) == idx.count(_ == k).toLong)
    // constant-index image via a doc id whose first pixels repeat is
    // not constructible from md5 noise; instead verify the ImageIO
    // reader agrees on the big image too (full-stream agreement)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big))
    assert(img != null && img.getWidth == 64)
    var mismatches = 0
    for (y <- 0 until 64; x <- 0 until 64) {
      val pal = GifBytes.palette(idx(y * 64 + x))
      val want = 0xff000000 | (pal(0) << 16) | (pal(1) << 8) | pal(2)
      if (img.getRGB(x, y) != want) mismatches += 1
    }
    assert(mismatches == 0, s"$mismatches pixel mismatches vs ImageIO")
  }

  test("resize: identity equals decode, NN picks exact pixels, corrupt rejects") {
    import graft.expressions.GifResize
    val (w, h, id) = (12, 10, 5L)
    val gif = GifBytes.build(w, h, id)
    // identity resize must reproduce decode verbatim (same struct)
    val dec = GifDecode.decode(gif)
    val same = GifResize.resize(gif, w, h)
    assert(same != null && same.getString(8) == dec.getString(8) &&
      (0 to 7).forall(i => same.get(i, GifDecode.schema(i).dataType) ==
        dec.get(i, GifDecode.schema(i).dataType)))
    // exact NN semantics: dst(x,y) = src(x*w/w2, y*h/h2)
    val (w2, h2) = (5, 4)
    val out = GifResize.resize(gif, w2, h2)
    assert(out != null && out.getInt(0) == w2 && out.getInt(1) == h2 &&
      out.getLong(3) == w2.toLong * h2)
    val src = closedFormIdx(id, w * h)
    val want = (0 until h2).flatMap(y => (0 until w2).map { x =>
      src((y * h / h2) * w + (x * w / w2))
    })
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(want.mkString(",").getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(out.getString(8) == hex)
    for (k <- 0 to 3) assert(out.getLong(4 + k) == want.count(_ == k).toLong)
    // corrupt input and absurd dims reject
    assert(GifResize.resize(gif.take(10), 2, 2) == null)
    assert(GifResize.resize(gif, 0, 5) == null)
    assert(GifResize.resize(gif, 1 << 12, 1 << 12) == null)
  }

  test("early-change tail boundary: EOI written at the grown width (sf0.1 regression)") {
    // ids 1144/4290 at 4x4 end their LZW stream with the dictionary
    // landing EXACTLY on 2^codeSize after the final data code — the
    // decoder (ours AND every standard one) grows the width before
    // reading EOI, so the encoder must too; these two streams decoded
    // to null before the fix. Pin our decode AND ImageIO agreement.
    for (id <- Seq(1144L, 4290L)) {
      val gif = GifBytes.build(4, 4, id)
      val d = GifDecode.decode(gif)
      assert(d != null, s"id=$id must decode")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(gif))
      assert(img != null && img.getWidth == 4 && img.getHeight == 4,
        s"ImageIO must accept the boundary stream for id=$id")
      for (y <- 0 until 4; x <- 0 until 4) {
        val idx = GifBytes.pixelIndex(id, y * 4 + x)
        val pal = GifBytes.palette(idx)
        val want = 0xff000000 | (pal(0) << 16) | (pal(1) << 8) | pal(2)
        assert(img.getRGB(x, y) == want,
          s"id=$id pixel ($x,$y) disagrees with ImageIO after the fix")
      }
    }
  }

  test("rejection: truncation, bad magic, missing trailer, junk") {
    val gif = GifBytes.build(9, 9, 1L)
    assert(GifDecode.decode(gif.take(gif.length - 1)) == null,
      "missing trailer must reject")
    assert(GifDecode.decode(gif.take(20)) == null, "truncated must reject")
    val badMagic = gif.clone(); badMagic(0) = 'X'.toByte
    assert(GifDecode.decode(badMagic) == null)
    assert(GifDecode.decode("not a gif at all".getBytes) == null)
    assert(GifDecode.decode(Array.emptyByteArray) == null)
    // flipping a sub-block length byte breaks framing
    val badLen = gif.clone()
    val dataStart = 13 + 12 + 10 + 1
    badLen(dataStart) = (badLen(dataStart) + 7).toByte
    assert(GifDecode.decode(badLen) == null)
  }
}
