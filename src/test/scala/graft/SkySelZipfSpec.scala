package graft

import org.scalatest.funsuite.AnyFunSuite

/** q378 skyline, q379 histogram selectivity, q380 Zipf vs log-logistic. */
class SkySelZipfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Naive O(n²) skyline on (maximize q, maximize len). */
  private def skyline(pts: Seq[(Double, Long)]): Set[(Double, Long)] =
    pts.filter { case (q, l) =>
      !pts.exists { case (q2, l2) =>
        (q2 >= q && l2 >= l) && (q2 > q || l2 > l)
      }
    }.toSet

  test("q378: closed-form skyline on a toy staircase") {
    val pts = Seq((0.9, 10L), (0.9, 20L), (0.5, 30L), (0.5, 15L),
      (0.2, 40L), (0.1, 5L))
    // dominated: (0.9,10) by (0.9,20); (0.5,15) by (0.5,30); (0.1,5)
    assert(skyline(pts) == Set((0.9, 20L), (0.5, 30L), (0.2, 40L)))
  }

  test("q378 gate frame: output matches the naive skyline exactly") {
    val got = SparkEntry.queries("q378_skyline")(spark, dir)
      .select("quality", "n_chars").as[(Double, Long)].collect().toSet
    val all = SparkEntry.queries("q25_quality")(spark, dir)
      .select("doc_id", "quality")
      .join(sources.Tables.documents(spark, dir), "doc_id")
      .select("quality", "n_chars").as[(Double, Long)]
      .collect().toSeq
    assert(got == skyline(all))
    // frontier is a strict staircase: quality desc => n_chars asc
    val ordered = got.toSeq.sortBy(-_._1)
    ordered.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._2 || a._1 == b._1)
      case _ =>
    }
  }

  test("q379 gate frame: estimate lands near the exact count") {
    val (n, lo, hi, est, actual, rel) =
      SparkEntry.queries("q379_selectivity")(spark, dir)
        .select("n_rows", "pred_lo_cents", "pred_hi_cents", "est_rows",
          "actual_rows", "rel_err")
        .as[(Long, Long, Long, Double, Long, Double)].head()
    assert(n == sources.Tables.lineitem(spark, dir).count())
    assert(lo == 1000000L && hi == 3000000L)
    assert(actual > 0 && est > 0)
    assert(math.abs(rel - (est - actual) / actual) < 1e-3)
    // equi-depth with 10 buckets: off by at most one bucket's mass
    assert(math.abs(est - actual) <= n / 10.0)
  }

  test("q380: R² discriminates a perfect power law") {
    // exact Zipf data: f = C/r -> ln f = ln C - ln r, R² = 1 on x1
    val pts = (1 to 50).map(r => (math.log(1000.0 / r), math.log(r.toDouble)))
    val k = pts.size
    val (sy, sx) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._2 * p._2).sum
    val syy = pts.map(p => p._1 * p._1).sum
    val r2 = math.pow(k * sxy - sx * sy, 2) /
      ((k * sxx - sx * sx) * (k * syy - sy * sy))
    assert(r2 > 0.9999)
  }

  test("q380 gate frame: R² in range and verdict consistent") {
    val (v, zr2, lr2, better) =
      SparkEntry.queries("q380_zipf_loglog")(spark, dir)
        .select("vocab", "zipf_r2", "loglogistic_r2", "better_model")
        .as[(Long, Double, Double, String)].head()
    assert(v > 0)
    assert(zr2 >= 0.0 && zr2 <= 1.0 && lr2 >= 0.0 && lr2 <= 1.0)
    assert(better == (if (zr2 >= lr2) "zipf" else "loglogistic"))
  }
}
