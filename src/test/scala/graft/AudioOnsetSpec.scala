package graft

import org.scalatest.funsuite.AnyFunSuite

/** q303 audio onset gate: engine path is segment-WAV bytes → real
  * PCM decode → integer frame loudness → jump test. Recomputed here
  * INDEPENDENTLY from the sample closed form (plain Scala md5). */
class AudioOnsetSpec extends AnyFunSuite {
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
  private def amp(id: Long, g: Long): Long = 8 + md5Mod(s"amp:$id:$g", 57)
  private def sample(id: Long, j: Int): Long = {
    val a = amp(id, j / 1024)
    (md5Mod(s"pcm:$id:$j", 65536) * a) / 64 - 512 * a
  }

  test("q303: per-doc onset outcome matches the closed form") {
    val out = SparkEntry.queries("q303_audio_onset")(spark, dir)
      .select("doc_id", "n_frames", "n_true", "n_det", "n_hit")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 500)
    out.foreach { case (id, nf, nTrue, nDet, nHit) =>
      val ns = ((4 + id % 5) * 1024).toInt
      assert(nf == ns / 256, s"doc $id frames")
      val e = (0 until ns / 256).map(f =>
        (f * 256 until (f + 1) * 256).map(j => math.abs(sample(id, j))).sum)
      var eTrue = 0L; var eDet = 0L; var eHit = 0L
      for (f <- 1 until ns / 256) {
        val det = e(f) * 2 > e(f - 1) * 3
        val truth = f % 4 == 0 && amp(id, f / 4) * 2 > amp(id, f / 4 - 1) * 3
        if (truth) eTrue += 1
        if (det) eDet += 1
        if (det && truth) eHit += 1
      }
      assert((nTrue, nDet, nHit) == ((eTrue, eDet, eHit)),
        s"doc $id: got ($nTrue,$nDet,$nHit) expected ($eTrue,$eDet,$eHit)")
    }
    // detector quality: high fractional agreement with planted truth
    val (t, d, hit) = (out.map(_._3).sum, out.map(_._4).sum, out.map(_._5).sum)
    assert(hit.toDouble / t > 0.9, s"recall ${hit.toDouble / t}")
    assert(hit.toDouble / d > 0.9, s"precision ${hit.toDouble / d}")
  }

  test("q303: generator bytes decode to the closed-form samples") {
    val bytes = graft.expressions.WavSegBytes.build(8000, 1, 4096, 11L)
    assert(new String(bytes.slice(0, 4), "ASCII") == "RIFF")
    assert(new String(bytes.slice(36, 40), "ASCII") == "data")
    // independent LE16 read of a spread of samples
    for (j <- Seq(0, 1, 255, 256, 1023, 1024, 1025, 4095)) {
      val lo = bytes(44 + 2 * j) & 0xff
      val hi = bytes(44 + 2 * j + 1)
      val v = (hi << 8) | lo
      assert(v.toLong == sample(11L, j), s"j=$j")
    }
    // segment structure is real: amplitudes differ across segments
    val amps = (0 until 4).map(g => amp(11L, g))
    assert(amps.distinct.length > 1)
  }
}
