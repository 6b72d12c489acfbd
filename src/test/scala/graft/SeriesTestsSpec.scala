package graft

import org.scalatest.funsuite.AnyFunSuite

/** q351 permutation entropy, q352 Ljung–Box, q353 runs test. */
class SeriesTestsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Closed-form order-3 permutation entropy (<=-convention codes). */
  private def permH(xs: Seq[Long]): (Long, Double) = {
    val pats = xs.sliding(3).filter(_.size == 3).map { w =>
      (if (w(0) <= w(1)) 4 else 0) + (if (w(1) <= w(2)) 2 else 0) +
        (if (w(0) <= w(2)) 1 else 0)
    }.toSeq
    val n = pats.size.toDouble
    val h = pats.groupBy(identity).values
      .map(g => -(g.size / n) * math.log(g.size / n)).sum
    (pats.size.toLong, h)
  }

  test("q351: monotone series has zero entropy, alternation stays below ln2") {
    assert(permH(Seq(1L, 2, 3, 4, 5, 6))._2 == 0.0)
    // strict alternation uses exactly two of the six patterns
    val (nw, h) = permH(Seq(1L, 9, 1, 9, 1, 9, 1, 9))
    assert(nw == 6 && math.abs(h - math.log(2.0)) < 1e-12)
  }

  test("q351 gate frame: window count and normalization consistent") {
    val (nw, np, hNats, hNorm) =
      SparkEntry.queries("q351_perm_entropy")(spark, dir)
        .select("n_windows", "n_patterns", "h_nats", "h_norm")
        .as[(Long, Long, Double, Double)].head()
    assert(nw == 28) // 30 days -> 28 order-3 windows
    assert(np >= 1 && np <= 6)
    assert(hNats >= 0.0 && hNats <= math.log(6.0) + 1e-9)
    assert(math.abs(hNorm - hNats / math.log(6.0)) < 1e-3)
  }

  test("q352 gate frame: Q nonnegative, decision matches the threshold") {
    val (n, q, df, rej) = SparkEntry.queries("q352_ljung_box")(spark, dir)
      .select("n_days", "q_stat", "df", "reject_white")
      .as[(Long, Double, Int, Int)].head()
    assert(n == 30 && df == 7)
    assert(q >= 0.0)
    assert(rej == (if (q > 14.067) 1 else 0))
  }

  test("q353: alternation maximizes runs, level split minimizes") {
    // closed form on the two extremes for n=10, n1=n2=5:
    // E[runs] = 2*5*5/10 + 1 = 6; alternation -> 10 runs, split -> 2
    def z(runs: Long, n1: Long, n2: Long): Double = {
      val n = (n1 + n2).toDouble
      val e = 2.0 * n1 * n2 / n + 1.0
      val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
      (runs - e) / math.sqrt(v)
    }
    assert(z(10, 5, 5) > 0 && z(2, 5, 5) < 0)
    assert(math.abs(z(6, 5, 5)) < 1e-12) // exactly expected -> z = 0
  }

  test("q353 gate frame: arm counts partition the kept days, z consistent") {
    val (n, n1, n2, runs, e, zz) =
      SparkEntry.queries("q353_runs_test")(spark, dir)
        .select("n_days", "n_above", "n_below", "runs",
          "expected_runs", "z")
        .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(n == n1 + n2 && n <= 30)
    assert(runs >= 1 && runs <= n)
    assert(math.abs(e - (2.0 * n1 * n2 / n + 1.0)) < 1e-3)
    val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) /
      (n.toDouble * n * (n - 1.0))
    assert(math.abs(zz - (runs - e) / math.sqrt(v)) < 1e-2)
  }
}
