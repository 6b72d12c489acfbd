package graft

import org.scalatest.funsuite.AnyFunSuite

/** q369 near-dup transitivity, q370 Brier decomposition, q371
  * capture–recapture. */
class TransBrierCrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q369: closed forms — a triangle is fully transitive, a path is not") {
    // triangle: 3 wedges, 1 triangle -> 3*1/3 = 1
    // path a-b-c: 1 wedge, 0 triangles -> 0
    def trans(edges: Set[(Int, Int)]): Double = {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map(_._2.size)
      val wedges = deg.map(d => d * (d - 1) / 2).sum
      val nodes = edges.flatMap(e => Seq(e._1, e._2))
      val tri = (for {
        a <- nodes; b <- nodes; c <- nodes
        if a < b && b < c
        if edges((a, b)) && edges((b, c)) && edges((a, c))
      } yield 1).size
      if (wedges == 0) 0.0 else 3.0 * tri / wedges
    }
    assert(trans(Set((1, 2), (2, 3), (1, 3))) == 1.0)
    assert(trans(Set((1, 2), (2, 3))) == 0.0)
  }

  test("q369 gate frame: counts consistent, transitivity in [0,1]") {
    val (np, nn, nw, nt, tr) =
      SparkEntry.queries("q369_neardup_transitivity")(spark, dir)
        .select("n_pairs", "n_nodes", "n_wedges", "n_triangles",
          "transitivity")
        .as[(Long, Long, Long, Long, Double)].head()
    assert(np >= 0 && nn <= 2 * np)
    assert(nw >= np - nn + 1 || nw >= 0)
    assert(nt * 3 <= nw || nw == 0)
    assert(tr >= 0.0 && tr <= 1.0)
    if (nw > 0) assert(math.abs(tr - 3.0 * nt / nw) < 1e-3)
  }

  test("q370 gate frame: decomposition closes with the residual") {
    val (n, brier, rel, res, unc, resid) =
      SparkEntry.queries("q370_brier_decomp")(spark, dir)
        .select("n", "brier", "reliability", "resolution",
          "uncertainty", "residual")
        .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(n == sources.Tables.embeddings(spark, dir).count())
    assert(brier >= 0.0 && rel >= 0.0 && res >= 0.0)
    assert(unc > 0.0 && unc <= 0.25 + 1e-9) // p(1-p) <= 1/4
    // identity: brier = REL - RES + UNC + residual (4dp tolerance)
    assert(math.abs(brier - (rel - res + unc + resid)) < 5e-4)
    // a random score has no skill: resolution ~ 0, brier >= unc - eps
    assert(res < 0.05)
  }

  test("q371: Chapman closed form and gate-frame consistency") {
    // textbook: n1=40, n2=50, m=10 -> LP 200, Chapman 40*... exact
    assert(40.0 * 50 / 10 == 200.0)
    assert(math.abs((41.0 * 51) / 11 - 1.0 - 189.0909) < 1e-3)
    val (nTrue, n1, n2, m, lp, ch, err) =
      SparkEntry.queries("q371_capture_recapture")(spark, dir)
        .select("n_true", "n1", "n2", "m", "lp_est", "chapman_est",
          "chapman_rel_err")
        .as[(Long, Long, Long, Long, Option[Double], Double, Double)]
        .head()
    assert(n1 <= nTrue && n2 <= nTrue && m <= math.min(n1, n2))
    assert(ch >= 0.0)
    assert(math.abs(err - (ch - nTrue) / nTrue) < 1e-3)
    if (m > 0)
      assert(math.abs(lp.get - n1.toDouble * n2 / m) < 1e-3)
  }
}
