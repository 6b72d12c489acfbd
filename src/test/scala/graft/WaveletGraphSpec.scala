package graft

import org.scalatest.funsuite.AnyFunSuite

/** q363 Haar energy, q364 two-hop harmonic, q365 anisotropy. */
class WaveletGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Closed-form Haar detail energies from the prefix-sum formula. */
  private def haar(xs: Seq[Long]): Map[Int, Double] = {
    val p = xs.scanLeft(0L)(_ + _)
    (1 to (math.log(xs.size) / math.log(2)).toInt).map { l =>
      val h = 1 << (l - 1)
      val e = (0 until xs.size / (2 * h)).map { k =>
        val a = k * 2 * h
        val d = (2 * p(a + h) - p(a) - p(a + 2 * h)).toDouble / (1 << l)
        d * d
      }.sum
      l -> e
    }.toMap
  }

  test("q363: constant series has zero energy everywhere; a step puts " +
      "all energy in the coarsest level") {
    val const = haar(Seq.fill(8)(7L))
    assert(const.values.forall(_ == 0.0))
    // step 0,0,0,0,1,1,1,1: only the level-3 (half-vs-half) detail fires
    val step = haar(Seq(0L, 0, 0, 0, 1, 1, 1, 1))
    assert(step(1) == 0.0 && step(2) == 0.0 && step(3) > 0.0)
    // alternation 1,0,1,0...: all energy at level 1
    val alt = haar(Seq(1L, 0, 1, 0, 1, 0, 1, 0))
    assert(alt(1) > 0.0 && alt(2) == 0.0 && alt(3) == 0.0)
  }

  test("q363 gate frame: dyadic coefficient counts, shares sum to 1") {
    val rows = SparkEntry.queries("q363_haar_energy")(spark, dir)
      .select("level", "n_coeffs", "energy", "energy_share")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (1L to 9L))
    rows.foreach { case (l, n, e, sh) =>
      assert(n == 512L >> l)
      assert(e >= 0.0 && sh >= 0.0)
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 5e-3)
  }

  test("q364 gate frame: top-20 ordered, h2 = d1 + d2/2 exactly") {
    val rows = SparkEntry.queries("q364_harmonic2")(spark, dir)
      .select("node", "n_1hop", "n_2hop", "h2", "rnk")
      .as[(Long, Long, Long, Double, Int)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._5).toSeq == (1 to 20))
    rows.foreach { case (_, d1, d2, h2, _) =>
      assert(d1 >= 1 && d2 >= 0)
      assert(h2 == d1 + d2 / 2.0)
    }
    // ordering: h2 nonincreasing, node asc within ties
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ =>
    }
  }

  test("q365 gate frame: anisotropy is the mu2/en2 ratio in [0,1]") {
    val (nv, nd, mu2, en2, ani, tvs) =
      SparkEntry.queries("q365_anisotropy")(spark, dir)
        .select("n_vecs", "n_dims", "mu_norm2", "mean_norm2",
          "anisotropy", "top_var_share")
        .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(nd == 64)
    assert(nv == sources.Tables.embeddings(spark, dir).count())
    assert(mu2 >= 0.0 && en2 > mu2) // Var(x) > 0 ⇒ E|x|² > |μ|²
    assert(math.abs(ani - mu2 / en2) < 1e-2)
    assert(tvs >= 1.0 / nd - 1e-9 && tvs <= 1.0)
  }
}
