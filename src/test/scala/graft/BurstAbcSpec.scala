package graft

import org.scalatest.funsuite.AnyFunSuite

/** q366 inter-arrival burstiness, q367 ABC classes, q368 sign fidelity. */
class BurstAbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q366: burstiness closed forms on the two extremes") {
    def b(gaps: Seq[Long]): Double = {
      val n = gaps.size
      val m = gaps.sum.toDouble / n
      val cv = math.sqrt(gaps.map(g => g * g).sum.toDouble / n - m * m) / m
      (cv - 1) / (cv + 1)
    }
    // perfectly regular: cv = 0 -> B = -1
    assert(b(Seq(10L, 10, 10, 10)) == -1.0)
    // one huge gap among many tiny ones: B -> +1 territory
    assert(b(Seq.fill(99)(1L) :+ 100000L) > 0.8)
  }

  test("q366 gate frame: near-Poisson synthetic arrivals give |B| small") {
    val rows = SparkEntry.queries("q366_interarrival")(spark, dir)
      .select("event_type", "n_gaps", "mean_gap_s", "cv", "burstiness")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, n, m, cv, b) =>
      assert(n > 0 && m > 0 && cv > 0)
      assert(math.abs(b - (cv - 1) / (cv + 1)) < 1e-3)
      assert(math.abs(b) < 0.5) // synthetic uniform-ish arrivals
    }
  }

  test("q367 gate frame: classes partition parts, shares ~ 80/15/5") {
    val rows = SparkEntry.queries("q367_abc_classes")(spark, dir)
      .select("cls", "n_parts", "revenue_cents", "revenue_share")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    val Seq(a, b, c) = rows.toSeq
    // boundary semantics: A stops once cumulative EXCLUSIVE share
    // reaches 80%, so A's inclusive share is >= 0.80 minus one part
    assert(a._4 >= 0.75 && a._4 <= 0.90)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 5e-3)
    // every part classified exactly once
    val nParts = sources.Tables.lineitem(spark, dir)
      .select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum == nParts)
  }

  test("q368 gate frame: hamming buckets are tight and fidelity decays") {
    val rows = SparkEntry.queries("q368_sign_fidelity")(spark, dir)
      .select("bucket", "n_pairs", "mean_cos", "min_hamming",
        "max_hamming")
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bkt, n, _, lo, hi) =>
      assert(n > 0)
      assert(lo >= bkt * 8 && hi < bkt * 8 + 8 && lo <= hi)
    }
    // cosine ordering survives binarization: the lowest-hamming bucket
    // is more similar on average than the highest
    val sorted = rows.sortBy(_._1)
    assert(sorted.head._3 > sorted.last._3)
  }
}
