package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q348 Krippendorff alpha, q349 fightin' words, q350 McNemar. */
class AgreementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Closed-form nominal alpha for two raters from (a,b) value pairs. */
  private def alphaOf(pairs: Seq[(String, String)]): Double = {
    val n = pairs.length
    val disagree = pairs.count(p => p._1 != p._2)
    val vals = pairs.flatMap(p => Seq(p._1, p._2))
    val nv = vals.groupBy(identity).map(_._2.size.toLong)
    val s1 = nv.sum; val s2 = nv.map(v => v * v).sum
    val dObs = disagree.toDouble / n
    val dExp = (s1 * s1 - s2).toDouble / (s1 * (s1 - 1))
    1.0 - dObs / dExp
  }

  test("q348: perfect agreement gives alpha 1, forced disagreement < 0") {
    assert(alphaOf(Seq(("a", "a"), ("b", "b"), ("a", "a"))) == 1.0)
    // systematic swap: every unit disagrees
    assert(alphaOf(Seq(("a", "b"), ("b", "a"), ("a", "b"))) < 0.0)
  }

  test("q348 gate frame: alpha consistent with its own D terms") {
    val out = SparkEntry.queries("q348_kripp_alpha")(spark, dir)
      .select("n_units", "n_disagree", "d_obs", "d_exp", "alpha")
      .as[(Long, Long, Double, Double, Double)].head()
    val (n, dis, dObs, dExp, a) = out
    assert(n > 0 && dis <= n)
    assert(math.abs(dObs - dis.toDouble / n) < 1e-3)
    assert(math.abs(a - (1.0 - dObs / dExp)) < 1e-3)
    // zh-labeled docs can never be predicted by the 5-way classifier
    // panel, so agreement is weak on this corpus
    assert(a < 0.5)
  }

  test("q349: one-sided terms get the largest |z|, prior shrinks rare terms") {
    // y1=50 in corpus1 only vs y1=1 in corpus1 only: same direction,
    // but the rare term must have smaller |z| under the prior
    def zOf(y1: Long, y2: Long, n1: Long, n2: Long, aw: Double): Double = {
      val a0 = 100.0
      val d = math.log((y1 + aw) / (n1 + a0 - y1 - aw)) -
        math.log((y2 + aw) / (n2 + a0 - y2 - aw))
      d / math.sqrt(1.0 / (y1 + aw) + 1.0 / (y2 + aw))
    }
    val zCommon = zOf(50, 0, 1000, 1000, 0.5)
    val zRare = zOf(1, 0, 1000, 1000, 0.01)
    assert(zCommon > zRare && zRare > 0)
  }

  test("q349 gate frame: zeta consistent and ordered by |zeta|") {
    val out = SparkEntry.queries("q349_fightin_words")(spark, dir)
      .select("n_es", "n_fr", "delta", "zeta")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.sliding(2).forall {
      case Array(x, y) => math.abs(x._4) >= math.abs(y._4); case _ => true
    })
    out.foreach { case (y1, y2, d, z) =>
      assert(y1 + y2 > 0)
      // sign of z matches sign of delta
      assert(d == 0.0 || d * z >= 0.0)
    }
  }

  test("q350: chi2 closed form and significance threshold") {
    def chi2(b: Long, c: Long): Double =
      math.pow(math.abs(b - c) - 1.0, 2) / (b + c)
    assert(chi2(30, 10) == 19.0 * 19 / 40)
    assert(chi2(30, 10) > 3.841) // clearly significant
    assert(chi2(12, 10) < 3.841) // nearly balanced: not significant
  }

  test("q350 gate frame: counts partition the discordant docs") {
    val out = SparkEntry.queries("q350_mcnemar")(spark, dir)
      .select("baseline", "b", "c", "chi2", "significant")
      .as[(String, Long, Long, Double, Int)].head()
    val (base, b, c, chi2, sig) = out
    assert(base == "en") // majority label in every sf dir
    assert(b >= 0 && c >= 0 && b + c > 0)
    assert(math.abs(chi2 -
      math.pow(math.abs(b - c) - 1.0, 2) / (b + c)) < 1e-3)
    assert(sig == (if (chi2 > 3.841) 1 else 0))
  }
}
