package graft

import org.scalatest.funsuite.AnyFunSuite

/** q354 Hurst R/S, q355 hourly periodogram, q356 Mann–Kendall. */
class SeriesSpectralSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Closed-form single-block R/S (the exact arithmetic the engine's
    * power-of-two block contract guarantees). */
  private def rsOf(xs: Seq[Double]): Double = {
    val n = xs.size
    val m = xs.sum / n
    val cum = xs.map(_ - m).scanLeft(0.0)(_ + _).tail
    val r = cum.max - cum.min
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / n)
    r / sd
  }

  test("q354: alternation has the minimal R/S, a ramp a large one") {
    assert(rsOf(Seq(0, 1, 0, 1, 0, 1, 0, 1).map(_.toDouble)) == 1.0)
    val ramp = rsOf((0 until 8).map(_.toDouble))
    assert(math.abs(ramp - 8.0 / math.sqrt(5.25)) < 1e-12)
    assert(ramp > 3.0) // persistent series: R grows with the trend
  }

  test("q354 gate frame: R/S grows with block size, H consistent with OLS") {
    val (r8, r16, r32, r64, h) =
      SparkEntry.queries("q354_hurst_rs")(spark, dir)
        .select("rs_8", "rs_16", "rs_32", "rs_64", "hurst")
        .as[(Double, Double, Double, Double, Double)].head()
    assert(r8 < r16 && r16 < r32 && r32 < r64)
    assert(h > 0.0 && h < 1.0)
    // recompute the 4-point log-log OLS slope from the gated rs values
    val pts = Seq(8.0 -> r8, 16.0 -> r16, 32.0 -> r32, 64.0 -> r64)
      .map { case (n, rs) => (math.log(n), math.log(rs)) }
    val k = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(h - slope) < 1e-3)
  }

  test("q355 gate frame: 47 periods, rank is the power ordering") {
    val rows = SparkEntry.queries("q355_periodogram")(spark, dir)
      .select("period", "power", "rnk")
      .as[(Long, Double, Int)].collect()
    assert(rows.length == 47)
    assert(rows.map(_._1).toSeq == (2L to 48L))
    assert(rows.map(_._3).sorted.toSeq == (1 to 47))
    rows.foreach { case (_, p, _) => assert(p >= 0.0) }
    // rank order agrees with (power desc, period asc)
    val byRank = rows.sortBy(_._3)
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ =>
    }
  }

  test("q356: S and VAR(S) closed forms on tiny series") {
    // strictly increasing n=5: S = 10 pairs all +1; no ties:
    // VAR = 5*4*15/18
    def sOf(xs: Seq[Long]): Long =
      (for (i <- xs.indices; j <- i + 1 until xs.size)
        yield math.signum(xs(j) - xs(i))).sum
    assert(sOf(Seq(1L, 2, 3, 4, 5)) == 10)
    assert(sOf(Seq(5L, 4, 3, 2, 1)) == -10)
    assert(sOf(Seq(2L, 2, 2)) == 0)
    assert(math.abs(5.0 * 4 * 15 / 18 - 16.6667) < 1e-3)
  }

  test("q356 gate frame: z matches the continuity-corrected closed form") {
    val (n, s, v, z, t) =
      SparkEntry.queries("q356_mann_kendall")(spark, dir)
        .select("n_days", "s_stat", "var_s", "z", "trend")
        .as[(Long, Long, Double, Double, Int)].head()
    assert(n == 30)
    assert(math.abs(s) <= n * (n - 1) / 2)
    val zExp =
      if (s > 0) (s - 1.0) / math.sqrt(v)
      else if (s < 0) (s + 1.0) / math.sqrt(v)
      else 0.0
    assert(math.abs(z - zExp) < 1e-3)
    assert(t == (if (z > 1.96) 1 else if (z < -1.96) -1 else 0))
  }
}
