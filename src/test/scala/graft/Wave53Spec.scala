package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C}

/** Wave 53 (q460): 1-D two-component GMM via EM — full numeric replay
  * on the driver. */
class Wave53Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rnd(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    if (x < 0) -math.floor(-x * p + 0.5) / p else math.floor(x * p + 0.5) / p
  }
  private def pct(sorted: Array[Double], p: Double): Double = {
    val pos = (sorted.length - 1) * p
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  test("q460: EM parameter chain matches a full driver replay") {
    val cents = graft.sources.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .select("value").collect()
      .map(r => math.round(r.getDouble(0) * 100))
    val xs = cents.map(_.toDouble / 100)
    val n = xs.length
    val sorted = xs.sorted
    val s1 = cents.sum
    val s2 = cents.map(c => c * c).sum
    val sg0 = rnd(math.sqrt(s2.toDouble / n -
      (s1.toDouble / n) * (s1.toDouble / n)) / 100, 4)
    var mu1 = rnd(pct(sorted, 0.25), 4); var sg1 = sg0; var pi1 = 0.5
    var mu2 = rnd(pct(sorted, 0.75), 4); var sg2 = sg0
    var lastN1 = 0.0
    for (_ <- 1 to 3) {
      val rs = xs.map { x =>
        val d1 = (x - mu1) / sg1
        val d2 = (x - mu2) / sg2
        val w1 = pi1 * math.exp(-0.5 * d1 * d1) / sg1
        val w2 = (1.0 - pi1) * math.exp(-0.5 * d2 * d2) / sg2
        if (w1 + w2 > 0) rnd(w1 / (w1 + w2), 6) else 0.5
      }
      val n1 = rs.map(BigDecimal(_)).sum.toDouble
      val sx1 = xs.indices.map(i => BigDecimal(rnd(rs(i) * xs(i), 6))).sum.toDouble
      val sxx1 = xs.indices.map(i =>
        BigDecimal(rnd(rs(i) * xs(i) * xs(i), 4))).sum.toDouble
      val sx2 = xs.indices.map(i =>
        BigDecimal(rnd((1.0 - rs(i)) * xs(i), 6))).sum.toDouble
      val sxx2 = xs.indices.map(i =>
        BigDecimal(rnd((1.0 - rs(i)) * xs(i) * xs(i), 4))).sum.toDouble
      val n2 = n - n1
      mu1 = rnd(sx1 / n1, 6)
      sg1 = rnd(math.sqrt(math.max(sxx1 / n1 - mu1 * mu1, 0.0001)), 6)
      mu2 = rnd(sx2 / n2, 6)
      sg2 = rnd(math.sqrt(math.max(sxx2 / n2 - mu2 * mu2, 0.0001)), 6)
      pi1 = rnd(n1 / n, 6)
      lastN1 = n1
    }
    val got = C.gmmEm(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1) == ((pi1, mu1, sg1, rnd(lastN1, 2))))
    assert(got(2) == ((rnd(1.0 - pi1, 6), mu2, sg2, rnd(n - lastN1, 2))))
    // proper mixture: weights in (0,1) and sum to ~1, components
    // ordered by construction (quartile init), positive spreads
    assert(pi1 > 0 && pi1 < 1)
    assert(mu1 <= mu2)
    assert(sg1 > 0 && sg2 > 0)
    assert(math.abs(got(1)._4 + got(2)._4 - n) < 0.01)

    // q463: the anomaly tail scores with the SAME fitted params
    def rnd6(x: Double) = rnd(x, 6)
    val evs = graft.sources.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val scored = evs.map { case (id, c) =>
      val x = c.toDouble / 100
      val d1 = (x - mu1) / sg1
      val d2 = (x - mu2) / sg2
      (id, x, rnd6(pi1 * math.exp(-0.5 * d1 * d1) / sg1 +
        (1.0 - pi1) * math.exp(-0.5 * d2 * d2) / sg2))
    }
    val expTail = scored.sortBy(t => (t._3, t._1)).take(20).toSeq
    val gotTail = C.gmmAnomaly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(gotTail == expTail)
    // the tail really is the least-likely slice
    val maxTail = gotTail.map(_._3).max
    assert(scored.count(_._3 < maxTail) <= 20)
  }
}
