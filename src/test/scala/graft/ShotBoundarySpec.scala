package graft

import org.scalatest.funsuite.AnyFunSuite

/** q302 shot-boundary gate: the engine path is generator bytes →
  * real AVI demux → frame means → lag distances → threshold. This
  * spec recomputes the expected per-doc outcome INDEPENDENTLY from
  * the pixel closed form (plain Scala md5, no shared decode code) and
  * checks the detection actually separates shots. */
class ShotBoundarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def md5Mod(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % m
  }
  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private def expected(id: Long): (Long, Long, Long, Long, Long) = {
    val w = (4 + id % 5).toInt
    val h = (4 + id % 4).toInt
    val nf = (12 + id % 9).toInt
    val sl = (4 + id % 3).toInt
    val stride = w * 3 + ((4 - (w * 3) % 4) % 4)
    // per-frame per-channel means from the closed form
    val means = (0 until nf).map { f =>
      (0 to 2).map { c =>
        val base = md5Mod(s"scene:$id:${f / sl}:$c", 200L)
        val noise = (0 until w * h).map { pix =>
          val i = (pix / w) * stride + (pix % w) * 3 + c
          md5Mod(s"avin:$id:$f:$i", 24L)
        }.sum
        round4(base.toDouble + noise.toDouble / (w * h))
      }
    }
    var nTrue = 0L; var nDet = 0L; var nHit = 0L
    for (f <- 1 until nf) {
      val dist = round4((0 to 2).map(c =>
        math.abs(means(f)(c) - means(f - 1)(c))).sum)
      val det = dist > 30.0
      val truth = f % sl == 0
      if (truth) nTrue += 1
      if (det) nDet += 1
      if (det && truth) nHit += 1
    }
    (nf.toLong, nTrue, nDet, nHit, sl.toLong)
  }

  test("q302: per-doc detection outcome matches the closed form") {
    val out = SparkEntry.queries("q302_shot_boundary")(spark, dir)
      .select("doc_id", "n_frames", "shot_len", "n_true", "n_det", "n_hit")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 500)
    out.foreach { case (id, nf, sl, nTrue, nDet, nHit) =>
      val (enf, eTrue, eDet, eHit, esl) = expected(id)
      assert((nf, sl, nTrue, nDet, nHit) == ((enf, esl, eTrue, eDet, eHit)),
        s"doc $id: got ($nf,$sl,$nTrue,$nDet,$nHit) " +
          s"expected ($enf,$esl,$eTrue,$eDet,$eHit)")
    }
    // the detector must actually separate shots: high aggregate recall,
    // near-zero false positives (fractional — single missed cuts from
    // close scene bases are expected, per the ImageDedupSpec lesson)
    val (t, d, hit) = (out.map(_._4).sum, out.map(_._5).sum, out.map(_._6).sum)
    assert(hit.toDouble / t > 0.95, s"recall ${hit.toDouble / t}")
    assert((d - hit).toDouble / d < 0.05, s"fp rate ${(d - hit).toDouble / d}")
  }

  test("q302: means come from a REAL demux of the scene container") {
    // decode one generated payload with the independent RIFF walk used
    // by the q140 spec family: container magics + strf dims
    val bytes = graft.expressions.AviDibBytes.buildScene(5, 4, 12, 33333, 7L)
    def ascii(off: Int, n: Int) = new String(bytes.slice(off, off + n), "ASCII")
    assert(ascii(0, 4) == "RIFF" && ascii(8, 4) == "AVI ")
    assert(ascii(20, 4) == "hdrl" && ascii(24, 4) == "avih")
    def le(off: Int, n: Int): Long =
      (0 until n).map(i => (bytes(off + i) & 0xffL) << (8 * i)).sum
    assert(le(176, 4) == 5 && le(180, 4) == 4) // strf dims
    assert(le(33 + 15, 4) == 12) // avih dwTotalFrames
    // every pixel byte matches the closed form (and pads are zero)
    val stride = 5 * 3 + 1
    val fs = stride * 4
    for (f <- 0 until 2; i <- 0 until fs) {
      val b = bytes(224 + f * (8 + fs) + 8 + i) & 0xff
      if (i % stride < 15) {
        val c = (i % stride) % 3
        val exp = md5Mod(s"scene:7:${f / 4}:$c", 200L) +
          md5Mod(s"avin:7:$f:$i", 24L)
        assert(b == exp, s"f=$f i=$i")
      } else assert(b == 0, s"pad f=$f i=$i")
    }
  }
}
