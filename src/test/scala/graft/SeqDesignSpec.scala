package graft

import org.scalatest.funsuite.AnyFunSuite

/** q372 PACF, q373 sample-size design, q374 EB stopping. */
class SeqDesignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Durbin–Levinson on given autocorrelations, closed form. */
  private def pacf(r: Seq[Double]): Seq[Double] = {
    var a = Vector(r(0))
    var v = 1.0 - r(0) * r(0)
    var out = Vector(r(0))
    for (k <- 2 to r.size) {
      val num = r(k - 1) - (1 until k).map(i => a(i - 1) * r(k - 1 - i)).sum
      val p = num / v
      a = (1 until k).map(i => a(i - 1) - p * a(k - 1 - i)).toVector :+ p
      v = v * (1 - p * p)
      out = out :+ p
    }
    out
  }

  test("q372: PACF of a pure AR(1) cuts off after lag 1") {
    val phi = 0.6
    val r = (1 to 5).map(k => math.pow(phi, k))
    val p = pacf(r)
    assert(math.abs(p(0) - phi) < 1e-12)
    (1 until 5).foreach(k => assert(math.abs(p(k)) < 1e-12))
  }

  test("q372 gate frame: pacf1 = r1 and recursion consistency") {
    val row = SparkEntry.queries("q372_pacf")(spark, dir).collect().head
    val n = row.getLong(0)
    val r = (1 to 5).map(k => row.getDouble(k))
    val p = (6 to 10).map(k => row.getDouble(k))
    assert(n == 30)
    assert(math.abs(p(0) - r(0)) < 1e-3)
    val expect = pacf(r)
    p.zip(expect).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-3)
    }
  }

  test("q373: FPC caps the required sample at the population") {
    // n0 huge vs N: n_req -> N; n0 tiny: n_req ~ n0
    def nreq(n0: Double, nPop: Double) = math.ceil(n0 / (1 + n0 / nPop))
    assert(nreq(1e9, 1000) <= 1000)
    assert(nreq(50, 1e9) == 50)
  }

  test("q373 gate frame: per-type design rows consistent") {
    val rows = SparkEntry.queries("q373_sample_size")(spark, dir)
      .select("event_type", "n_pop", "mean_value", "sd_value",
        "n_infinite", "n_required", "sample_frac")
      .as[(String, Long, Double, Double, Double, Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, n, m, sd, n0, nr, frac) =>
      assert(m > 0 && sd > 0)
      assert(nr <= n) // FPC can never demand more than the population
      assert(math.abs(frac - nr.toDouble / n) < 1e-3)
      assert(nr <= math.ceil(n0) || n0 > n)
    }
  }

  test("q374 gate frame: EB radius shrinks and the flag is consistent") {
    val rows = SparkEntry.queries("q374_eb_stopping")(spark, dir)
      .select("n_cum", "running_mean", "eb_radius", "can_stop")
      .as[(Long, Double, Double, Int)].collect()
    assert(rows.length == 30)
    // cumulative n strictly increases; radius decreases overall
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.last._3 < rows.head._3)
    rows.foreach { case (_, m, eb, f) =>
      assert(eb > 0)
      assert(f == (if (eb < m * 0.05) 1 else 0))
    }
  }
}
