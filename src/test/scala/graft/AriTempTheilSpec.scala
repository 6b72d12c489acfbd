package graft

import org.scalatest.funsuite.AnyFunSuite

/** q388 ARI, q389 temperature scaling, q390 Theil decomposition. */
class AriTempTheilSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Closed-form ARI from a contingency matrix. */
  private def ari(m: Seq[Seq[Long]]): Double = {
    def c2(x: Long) = x * (x - 1) / 2
    val n = m.flatten.sum
    val cells = m.flatten.map(c2).sum.toDouble
    val a = m.map(r => c2(r.sum)).sum.toDouble
    val b = m.transpose.map(col => c2(col.sum)).sum.toDouble
    val exp = a * b / c2(n)
    (cells - exp) / ((a + b) / 2 - exp)
  }

  test("q388: ARI closed forms — identity 1, independence ~0") {
    assert(math.abs(ari(Seq(Seq(10L, 0L), Seq(0L, 10L))) - 1.0) < 1e-12)
    // perfectly crossed partitions: ARI <= 0
    assert(ari(Seq(Seq(5L, 5L), Seq(5L, 5L))) <= 0.0 + 1e-12)
  }

  test("q388 gate frame: terms consistent with the closed form") {
    val (n, cells, a2, b2, exp, a) =
      SparkEntry.queries("q388_adjusted_rand")(spark, dir)
        .select("n_docs", "sum_cells2", "sum_a2", "sum_b2",
          "expected_index", "ari")
        .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(n == 500)
    assert(cells <= math.min(a2, b2)) // pair intersections bound
    val cn2 = n * (n - 1) / 2.0
    assert(math.abs(exp - a2 * b2 / cn2) < 1e-2)
    assert(math.abs(a - (cells - exp) / ((a2 + b2) / 2.0 - exp)) < 1e-3)
    assert(a < 0.2) // word-soup corpus: partition agreement ~ chance
  }

  test("q389: flattening an uninformative score lowers NLL") {
    val rows = SparkEntry.queries("q389_temp_scaling")(spark, dir)
      .select("temperature", "n", "mean_nll", "is_best")
      .as[(Double, Long, Double, Int)].collect()
    assert(rows.map(_._1).toSeq == Seq(0.5, 1.0, 2.0))
    assert(rows.map(_._4).sum == 1) // exactly one winner
    val byT = rows.map(r => r._1 -> r._3).toMap
    // T=2 pulls a random score toward 0.5: NLL must improve over T=1,
    // and sharpening (T=0.5) must hurt
    assert(byT(2.0) < byT(1.0) && byT(1.0) < byT(0.5))
    assert(rows.find(_._4 == 1).get._1 == 2.0)
  }

  test("q390 gate frame: the decomposition identity closes") {
    val rows = SparkEntry.queries("q390_theil")(spark, dir)
      .select("group", "n_members", "rev_share", "theil_within",
        "between_contrib")
      .as[(String, Long, Double, Double, Option[Double])].collect()
    val total = rows.find(_._1 == "__all").get
    val nations = rows.filter(_._1 != "__all")
    assert(nations.length == 25)
    assert(math.abs(nations.map(_._3).sum - 1.0) < 1e-3)
    assert(total._4 >= 0.0) // Theil T is nonnegative
    // T_total = sum s_g T_g + sum between contributions (4dp pins)
    val within = nations.map(r => r._3 * r._4).sum
    val between = nations.map(_._5.get).sum
    assert(math.abs(total._4 - (within + between)) < 5e-3)
    // synthetic near-uniform revenue: most inequality is WITHIN
    assert(between.abs < total._4)
  }
}
