package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q357 effect sizes, q358 AMS F2 sketch, q359 centroid eval. */
class SketchEffectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def cohenD(a: Seq[Double], b: Seq[Double]): Double = {
    def mv(x: Seq[Double]) = {
      val m = x.sum / x.size
      (m, x.map(v => (v - m) * (v - m)).sum / (x.size - 1))
    }
    val ((m1, v1), (m2, v2)) = (mv(a), mv(b))
    val sp = math.sqrt(((a.size - 1) * v1 + (b.size - 1) * v2) /
      (a.size + b.size - 2))
    (m1 - m2) / sp
  }

  test("q357: unit-shifted equal-variance samples give d = shift/sd") {
    val a = Seq(1.0, 2, 3, 4, 5)
    val b = a.map(_ - 1.0) // shift down by 1, sd unchanged
    val d = cohenD(a, b)
    assert(math.abs(d - 1.0 / math.sqrt(2.5)) < 1e-12)
    // Hedges' correction always shrinks |d|
    val g = d * (1.0 - 3.0 / (4.0 * 10 - 9.0))
    assert(math.abs(g) < math.abs(d))
  }

  test("q357 gate frame: internally consistent panel") {
    val (n1, n2, m1, m2, d, g, delta) =
      SparkEntry.queries("q357_effect_sizes")(spark, dir)
        .select("n_click", "n_view", "mean_click", "mean_view",
          "cohen_d", "hedges_g", "cliff_delta")
        .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    assert(n1 > 0 && n2 > 0)
    // d and the mean difference share a sign; g shrinks toward 0
    assert(d == 0.0 || d * (m1 - m2) > 0.0)
    assert(math.abs(g) <= math.abs(d))
    assert(delta >= -1.0 && delta <= 1.0)
    // delta and d agree in sign on this panel (same location shift)
    assert(d == 0.0 || delta == 0.0 || d * delta > 0.0)
  }

  test("q358: a single-user stream estimates F2 exactly in every lane") {
    // counter_j = ±cnt, so counter² = cnt² = F2 in all 64 lanes; the
    // median of means of a constant is that constant
    val est = Seq.fill(64)(49L).grouped(16).map(_.sum / 16.0).toSeq
    assert(est.distinct == Seq(49.0))
  }

  test("q358 gate frame: exact F2 bounds and sane relative error") {
    val (nu, f2, est, rel) = SparkEntry.queries("q358_ams_f2")(spark, dir)
      .select("n_users", "f2_exact", "f2_est", "rel_err")
      .as[(Long, Long, Double, Double)].head()
    val nEvents = sources.Tables.events(spark, dir).count()
    // Cauchy-Schwarz bounds: N²/u <= F2 <= N²
    assert(f2 >= nEvents * nEvents / nu && f2 <= nEvents * nEvents)
    assert(est > 0)
    assert(math.abs(rel - (est - f2.toDouble) / f2) < 1e-3)
    // 64-lane AMS on this skew: relative error well under 1
    assert(math.abs(rel) < 0.8)
  }

  test("q359 gate frame: folds partition, counts consistent") {
    val rows = SparkEntry.queries("q359_centroid_eval")(spark, dir)
      .select("label", "n_test", "n_correct", "acc")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (_, n, c, a) =>
      assert(n > 0 && c >= 0 && c <= n)
      assert(math.abs(a - c.toDouble / n) < 1e-3)
    }
    // every test-fold vector with a represented label gets scored:
    // the per-label n_test must sum to the md5 %5==0 fold size
    val emb = sources.Tables.embeddings(spark, dir)
    val testN = emb.filter(
      functions.TextFunctions.md5Int(
        concat(lit("ceval:"), col("vec_id").cast("string")), 8)
        % 5 === 0).count()
    assert(rows.map(_._2).sum == testN)
  }
}
