package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{PngBytes, PngDecode}

/** PNG codec robustness: the gate (q145) proves decoded CONTENT equals
  * the generator's closed form; this spec covers what the oracle
  * cannot — the decoder's rejection paths (corrupt CRC, truncated
  * stream, bad filter, junk) and the spec details (multi-IDAT split,
  * all five filters present, ancillary-chunk tolerance). */
class PngCodecSpec extends AnyFunSuite {

  private def be(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private val png = PngBytes.build(7, 11, 42L, 0) // h=11 ⇒ filters 0..4 twice+

  test("round-trip: decode recovers IHDR facts and exact pixel means") {
    val row = PngDecode.decode(png)
    assert(row != null)
    assert(row.getInt(0) == 7 && row.getInt(1) == 11)
    assert(row.getInt(2) == 8 && row.getInt(3) == 2)
    assert(row.getLong(5) == 77L)
    // independent closed-form means from the md5 convention
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Long](3)
    for (i <- 0 until 7 * 11 * 3) {
      val d = md.digest(s"png:42:$i".getBytes("UTF-8"))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      sums(i % 3) += v % 256L
    }
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(row.getDouble(6) == r4(sums(0).toDouble / 77))
    assert(row.getDouble(7) == r4(sums(1).toDouble / 77))
    assert(row.getDouble(8) == r4(sums(2).toDouble / 77))
  }

  test("the encoder really splits IDAT and cycles every filter type") {
    val row = PngDecode.decode(png)
    assert(row.getInt(4) > 1, "payload must carry multiple IDAT chunks")
    // inflate the raw scanline stream and check filter bytes 0..4 occur
    var pos = 8
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 12 <= png.length) {
      val len = ((png(pos) & 0xffL) << 24 | (png(pos + 1) & 0xffL) << 16 |
        (png(pos + 2) & 0xffL) << 8 | (png(pos + 3) & 0xffL)).toInt
      if (new String(png, pos + 4, 4, "US-ASCII") == "IDAT")
        idat.write(png, pos + 8, len)
      pos += 12 + len
    }
    val inf = new java.util.zip.Inflater(false)
    inf.setInput(idat.toByteArray)
    val scan = new Array[Byte](11 * (1 + 21))
    var got = 0
    while (got < scan.length) got += inf.inflate(scan, got, scan.length - got)
    val filters = (0 until 11).map(r => scan(r * 22) & 0xff).toSet
    assert(filters == Set(0, 1, 2, 3, 4))
  }

  test("decoder rejects corruption, truncation, and junk with null") {
    assert(PngDecode.decode(null) == null)
    assert(PngDecode.decode(Array[Byte](1, 2, 3)) == null)
    assert(PngDecode.decode("not a png at all, just bytes".getBytes) == null)
    // flip one IDAT payload byte → that chunk's CRC must fail
    val corrupt = png.clone()
    corrupt(60) = (corrupt(60) ^ 0x5a).toByte
    assert(PngDecode.decode(corrupt) == null)
    // drop the trailing IEND chunk → grammar incomplete
    assert(PngDecode.decode(png.dropRight(12)) == null)
    // oversized declared dims must be rejected before allocation
    val big = png.clone()
    System.arraycopy(be(0x7fffffffL), 0, big, 16, 4) // IHDR width
    assert(PngDecode.decode(big) == null) // (CRC also fails — either path)
  }

  test("decoder tolerates spec-legal ancillary chunks") {
    // splice a CRC-valid tEXt chunk between IHDR and first IDAT
    val data = "comment".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
    val chunk = be(data.length.toLong) ++ "tEXt".getBytes("US-ASCII") ++
      data ++ be(crc.getValue)
    val cut = 8 + 12 + 13 // after IHDR
    val spliced = png.take(cut) ++ chunk ++ png.drop(cut)
    val row = PngDecode.decode(spliced)
    assert(row != null && row.getInt(0) == 7)
  }

  test("expression works end-to-end in a Spark plan via the extension") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Seq(3L, 9L).toDF("id")
      .selectExpr("id",
        "graft_png_decode(graft_png_bytes(CAST(4 AS INT), CAST(6 AS INT), id)) AS m")
      .selectExpr("id", "m.width", "m.height", "m.mean_r")
      .collect()
    assert(out.length == 2 && out.forall(r => r.getInt(1) == 4 && r.getInt(2) == 6))
    assert(out.map(_.getDouble(3)).distinct.length == 2) // content differs by id
  }
}
