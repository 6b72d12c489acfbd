package graft

import org.scalatest.funsuite.AnyFunSuite

/** HyperANF (q260) and WL color refinement (q261). Register/estimate
  * value truth is the DuckDB oracle; here we pin the sketch against an
  * EXACT BFS ball computation (the accuracy contract the oracle can't
  * state) and the refinement-lattice invariants. */
class GraphSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private lazy val edges: Map[Long, Set[Long]] = {
    val pairs = graft.sources.Tables.lineitem(spark, dir)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") % 10 === 0)
      .select(
        (org.apache.spark.sql.functions.col("l_partkey") * 2).as("p"),
        (org.apache.spark.sql.functions.col("l_suppkey") * 2 + 1).as("sp"))
      .distinct().as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    adj.toMap
  }

  test("q260: neighborhood function is monotone, reaches 90% by r=3, avg matches sum") {
    val rows = SparkEntry.queries("q260_hyperanf")(spark, dir)
      .select("r", "n_nodes", "nf_est", "avg_ball", "reached_90")
      .as[(Int, Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(1)._3 >= w(0)._3 - 1e-6, "N(r) must be non-decreasing in r")
    }
    assert(rows.last._5, "r=3 trivially reaches 90% of itself")
    rows.foreach { case (_, n, nf, avg, _) =>
      assert(math.abs(avg - nf / n) < 1e-2)
    }
  }

  test("q260: HLL ball estimates track the exact BFS neighborhood function") {
    // exact N(r) by BFS over the collected (tiny at sf0.001) graph
    val nodes = edges.keySet
    def ballSizes(r: Int): Long = nodes.toSeq.map { v =>
      var ball = Set(v)
      var frontier = Set(v)
      for (_ <- 1 to r) {
        frontier = frontier.flatMap(edges.getOrElse(_, Set.empty)) -- ball
        ball ++= frontier
      }
      ball.size.toLong
    }.sum
    val est = SparkEntry.queries("q260_hyperanf")(spark, dir)
      .select("r", "nf_est").as[(Int, Double)].collect().toMap
    for (r <- 0 to 3) {
      val exact = ballSizes(r).toDouble
      val rel = math.abs(est(r) - exact) / exact
      assert(rel < 0.15,
        s"HLL p=6 N($r) estimate ${est(r)} vs exact $exact: rel err $rel")
    }
  }

  test("q261: classes only split — color count non-decreasing, nodes conserved") {
    val rows = SparkEntry.queries("q261_wl_refinement")(spark, dir)
      .select("iter", "class_size", "n_classes")
      .as[(Int, Long, Long)].collect()
    val byIter = rows.groupBy(_._1)
    assert(byIter.keySet == Set(0, 1, 2))
    val totals = byIter.map { case (i, rs) =>
      i -> rs.map(r => r._2 * r._3).sum
    }
    assert(totals.values.toSet.size == 1,
      s"every round must cover all nodes: $totals")
    val nColors = byIter.map { case (i, rs) => i -> rs.map(_._3).sum }
    assert(nColors(1) >= nColors(0) && nColors(2) >= nColors(1),
      s"WL refinement can only split classes: $nColors")
  }
}
