package graft

import org.scalatest.funsuite.AnyFunSuite

/** OLS diagnostics (q267) and generalized-ESD outliers (q268). Value
  * truth is the DuckDB oracle; here we pin the estimator identities
  * on hand-built frames and the gate invariants. */
class TrendDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q267: R-squared in [0,1], DW in [0,4], slope finite") {
    val (n, slope, icept, r2, dw) =
      SparkEntry.queries("q267_ols_diagnostics")(spark, dir)
        .as[(Long, Double, Double, Double, Double)].collect().head
    assert(n > 2)
    assert(!slope.isNaN && !icept.isNaN)
    assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9)
    assert(dw >= 0 && dw <= 4.0 + 1e-9)
  }

  test("q267: OLS identities on a hand frame — perfect line gives R2=1, DW of iid-ish residuals near 2") {
    // y = 2x + 5 exactly: residuals 0, R2 = 1
    val xs = (0 until 20).map(_.toDouble)
    val ys = xs.map(x => 2 * x + 5)
    val n = xs.length
    val (xb, yb) = (xs.sum / n, ys.sum / n)
    val b = xs.zip(ys).map { case (x, y) => (x - xb) * (y - yb) }.sum /
      xs.map(x => (x - xb) * (x - xb)).sum
    val a = yb - b * xb
    assert(math.abs(b - 2) < 1e-12 && math.abs(a - 5) < 1e-12)
    val e = xs.zip(ys).map { case (x, y) => y - a - b * x }
    assert(e.map(v => v * v).sum < 1e-18)
    // alternating residuals drive DW toward 4 (negative autocorr)
    val alt = (0 until 20).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val dwAlt = alt.sliding(2).map { case Seq(p, c) => (c - p) * (c - p) }
      .sum / alt.map(v => v * v).sum
    assert(dwAlt > 3.5)
  }

  test("q268: three rounds, days distinct, z decreasing is NOT required but rows well-formed") {
    val rows = SparkEntry.queries("q268_esd_outliers")(spark, dir)
      .select("round", "day", "z", "is_outlier")
      .as[(Int, java.sql.Date, Double, Boolean)].collect()
    assert(rows.map(_._1).toSeq.sorted == Seq(1, 2, 3))
    assert(rows.map(_._2).distinct.length == 3, "each round removes a new day")
    rows.foreach { case (_, _, z, flag) =>
      assert(z >= 0)
      assert(flag == (z > 3.0) || math.abs(z - 3.0) < 1e-9)
    }
  }

  test("q270: life table invariants — risk sets shrink, survival monotone, censoring honored") {
    val rows = SparkEntry.queries("q270_survival_hazard")(spark, dir)
      .select("age_days", "n_risk", "n_churn", "hazard", "survival")
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(0)._1 < w(1)._1)
        assert(w(0)._2 > w(1)._2, "risk set strictly shrinks with age")
        assert(w(0)._5 >= w(1)._5 - 1e-9, "survival is non-increasing")
      }
    }
    rows.foreach { case (_, risk, churn, h, sv) =>
      assert(churn <= risk && h >= 0 && h <= 1 && sv >= 0 && sv <= 1)
    }
    // censored users never churn: total churners < total users
    val users = graft.sources.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(rows.map(_._3).sum < users,
      "at least the last-day-active users must be censored")
    // S(k) really is the product of (1 - h) up to k (at 4dp pinning)
    var prod = 1.0
    rows.foreach { case (_, risk, churn, _, sv) =>
      prod *= (1.0 - churn.toDouble / risk)
      assert(math.abs(sv - prod) < 5e-4, s"survival drifted from product: $sv vs $prod")
    }
  }

  test("q268: a planted spike is the round-1 extraction (masking scenario)") {
    // direct check of the round logic on a hand frame with two spikes
    def top(xs: Seq[Double]): (Int, Double) = {
      val n = xs.length
      val mu = xs.sum / n
      val sd = math.sqrt((xs.map(v => v * v).sum - n * mu * mu) / (n - 1))
      val zs = xs.map(v => math.abs(v - mu) / sd)
      val i = zs.indices.maxBy(i => (zs(i), -i))
      (i, zs(i))
    }
    val base = Seq.fill(28)(100.0)
    val spiked = (base :+ 500.0) :+ 400.0
    val (i1, z1) = top(spiked)
    assert(i1 == 28, "biggest spike extracted first")
    val rest = spiked.patch(i1, Nil, 1)
    val (i2, z2) = top(rest)
    assert(rest(i2) == 400.0, "second spike surfaces once the mask is removed")
    assert(z2 > z1 * 0.5, "masked spike's z recovers after removal")
  }
}
