package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Image perceptual-hash dedup (q258/q259): the native PngDhash
  * expression (real PNG decode → 9×8 NN grid → 64 gradient bits) and
  * the banded-Hamming near-dup join over planted photometric
  * variants. Value truth is the DuckDB md5-closed-form oracle; here
  * we pin the hash's invariance contract and the planted-pair
  * separation the oracle compare can't see. */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def bandsOf(id: Long, w: Int, h: Int, delta: Int): Seq[Int] =
    Seq(id).toDF("doc_id")
      .select(call_function("graft_png_dhash",
        call_function("graft_png_bytes", lit(w), lit(h), col("doc_id"),
          lit(delta))).as("d"))
      .select("d.b0", "d.b1", "d.b2", "d.b3")
      .as[(Int, Int, Int, Int)].collect()
      .map(t => Seq(t._1, t._2, t._3, t._4)).head

  test("dhash: deterministic, 16-bit bands, null on garbage") {
    val a = bandsOf(42L, 12, 9, 0)
    val b = bandsOf(42L, 12, 9, 0)
    assert(a == b)
    a.foreach(v => assert(v >= 0 && v <= 0xffff))
    val garbage = Seq(Array[Byte](1, 2, 3)).toDF("p")
      .select(call_function("graft_png_dhash", col("p")))
      .collect().head
    assert(garbage.isNullAt(0))
  }

  test("dhash: invariant under a mild brightness shift, sensitive to different content") {
    def hamming(x: Seq[Int], y: Seq[Int]): Int =
      x.zip(y).map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    // brightness +8 flips only clamp-bent gradients — stays near 0
    val shifts = (0L until 20L).map { id =>
      hamming(bandsOf(id, 12, 9, 0), bandsOf(id, 12, 9, 8))
    }
    assert(shifts.max <= 4, s"brightness shift must barely move dHash: $shifts")
    // different content at the same dims lands far away
    val cross = (0L until 10L).map { id =>
      hamming(bandsOf(id, 12, 9, 0), bandsOf(id + 1000, 12, 9, 0))
    }
    assert(cross.sum / cross.length >= 10,
      s"unrelated images must differ substantially: $cross")
  }

  test("png bytes: 4-arg delta=0 is byte-identical to the legacy 3-arg form") {
    val rows = Seq(7L).toDF("doc_id")
      .select(
        call_function("graft_png_bytes", lit(10), lit(8), col("doc_id"))
          .as("p3"),
        call_function("graft_png_bytes", lit(10), lit(8), col("doc_id"),
          lit(0)).as("p4"))
      .as[(Array[Byte], Array[Byte])].collect().head
    assert(java.util.Arrays.equals(rows._1, rows._2))
  }

  test("q259: every planted copy is recovered, pairs separate by hamming") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id").as[Long].collect()
    val planted = docs.filter(_ % 17 == 0).map(d => (d * 2, d * 2 + 1)).toSet
    val out = SparkEntry.queries("q259_image_neardup")(spark, dir)
      .select("id_a", "id_b", "n_bands", "hamming")
      .as[(Long, Long, Int, Int)].collect()
    val found = out.map(r => (r._1, r._2)).toSet
    // recovery is a FRACTION, not all-pairs: a +8 brightness clamp can
    // in principle flip bits in 3 of 4 bands for an unlucky image, so
    // an exact-subset assert would be data-dependent flaky on other
    // scale factors even with engine/oracle parity intact (r9 advice)
    val recovered = planted.count(found)
    assert(recovered >= math.ceil(planted.size * 0.9).toInt,
      s"recovered only $recovered/${planted.size} planted pairs: " +
        s"missing ${planted -- found}")
    out.foreach { case (a, b, nb, ham) =>
      assert(a < b && nb >= 2 && ham <= 10)
      if (planted((a, b)))
        assert(ham <= 2, s"planted pair ($a,$b) drifted to hamming $ham")
    }
  }

  test("q258: one hash row per document, bands bounded") {
    val out = SparkEntry.queries("q258_image_dhash")(spark, dir)
    val n = graft.sources.Tables.documents(spark, dir).count()
    assert(out.count() == n)
    assert(out.filter(col("b0") < 0 || col("b0") > 0xffff ||
      col("b3") < 0 || col("b3") > 0xffff).count() == 0)
  }
}
