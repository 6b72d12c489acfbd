package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{PngBytes, PngDecode, PngResize}

/** PngResize (q264): real decode → NN resample → re-encode. The gate
  * pins the floor-composition closed form; here we pin the codec
  * round-trip and the resize semantics the oracle can't see. */
class PngResizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("2x NN upscale: dims double, channel means are EXACTLY preserved") {
    val png = PngBytes.build(7, 5, 99L, 0)
    val big = PngResize.resize(png, 14, 10)
    assert(big != null)
    val a = PngDecode.decode(png)
    val b = PngDecode.decode(big)
    assert(b.getInt(0) == 14 && b.getInt(1) == 10)
    // each source pixel appears exactly 4x -> identical mean ratios
    assert(a.getDouble(6) == b.getDouble(6))
    assert(a.getDouble(7) == b.getDouble(7))
    assert(a.getDouble(8) == b.getDouble(8))
  }

  test("downscale picks exactly the NN grid pixels (1x1 thumbnail = pixel (0,0))") {
    val png = PngBytes.build(6, 4, 3L, 0)
    val one = PngResize.resize(png, 1, 1)
    val row = PngDecode.decode(one)
    assert(row.getInt(0) == 1 && row.getInt(1) == 1)
    // pixel (0,0) closed form: md5("png:3:0..2") bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    def px(i: Int): Int = {
      val d = md.digest(s"png:3:$i".getBytes("UTF-8"))
      ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % 256L).toInt
    }
    assert(row.getDouble(6) == px(0).toDouble)
    assert(row.getDouble(7) == px(1).toDouble)
    assert(row.getDouble(8) == px(2).toDouble)
  }

  test("resize rejects garbage and absurd dims with null") {
    assert(PngResize.resize(null, 4, 4) == null)
    assert(PngResize.resize(Array[Byte](1, 2, 3), 4, 4) == null)
    val png = PngBytes.build(4, 4, 1L, 0)
    assert(PngResize.resize(png, 0, 4) == null)
    assert(PngResize.resize(png, 1 << 12, 1 << 12) == null)
  }

  test("q264: every 11th doc audited; exact-2x resize is hash-invariant (hamming 0)") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q264_image_scale_hash")(spark, dir)
      .select("hamming").as[Int].collect()
    assert(out.nonEmpty)
    assert(out.forall(_ == 0),
      "integer-ratio NN resize composes floors exactly — dHash must not move")
    // a NON-integer ratio genuinely moves grid samples. On md5 NOISE
    // images (zero spatial correlation) a moved sample is a fresh
    // random pixel, so the hash shifts substantially — the hamming>0
    // here proves the 2x invariance above is structural (floor
    // composition), not a vacuous pass. Real photographs correlate
    // neighboring pixels, which is what keeps non-integer-ratio
    // thumbnails NEAR the original in production dHash pipelines.
    val ham = Seq(42L).toDF("doc_id")
      .select(
        call_function("graft_png_dhash",
          call_function("graft_png_bytes", lit(10), lit(8), col("doc_id")))
          .as("d1"),
        call_function("graft_png_dhash",
          call_function("graft_png_resize",
            call_function("graft_png_bytes", lit(10), lit(8), col("doc_id")),
            lit(13), lit(11))).as("d2"))
      .select((bit_count(col("d1.b0").bitwiseXOR(col("d2.b0"))) +
        bit_count(col("d1.b1").bitwiseXOR(col("d2.b1"))) +
        bit_count(col("d1.b2").bitwiseXOR(col("d2.b2"))) +
        bit_count(col("d1.b3").bitwiseXOR(col("d2.b3")))).as("h"))
      .as[Long].collect().head
    assert(ham > 0, "non-integer ratio must move at least one grid sample")
  }
}
