package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q305 modularity: plain-Scala recompute from the engine's own LPA
  * labels (the label fixpoint itself is q93's oracle-pinned surface;
  * this pins the MODULARITY arithmetic on top of it), plus a planted
  * two-clique graph where Q must be high. */
class ModularitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("q305: Q matches a direct recompute from the LPA labels") {
    val pairs = graft.sources.Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct().as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (p, sp) => Seq((p, sp), (sp, p)) }
    val edgeDf = edges.toSeq.toDF("src", "dst")
    val lab = graft.graph.GraphOps
      .labelPropagation(edgeDf, iters = 2, assumeDistinct = true)
      .as[(Long, Long)].collect().toMap
    val m = pairs.length.toLong
    val byComm = edges.groupBy(e => lab(e._1))
    val s = byComm.map { case (c, es) =>
      val dc = es.length.toLong
      val intra2 = es.count(e => lab(e._2) == c).toLong
      2 * m * intra2 - dc * dc
    }.sum
    val q = s.toDouble / (4.0 * m * m)
    val got = SparkEntry.queries("q305_modularity")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == lab.values.toSet.size)
    assert(got._2 == lab.size && got._3 == m)
    assert(got._4 == round4(q), s"Q ${got._4} vs $q")
    assert(got._4 >= -0.5 && got._4 <= 1.0)
  }

  test("modularity arithmetic: two planted cliques score high") {
    // two 5-cliques joined by one bridge edge; communities = cliques
    val cliqueA = for (i <- 0L to 4L; j <- 0L to 4L if i < j) yield (i, j)
    val cliqueB = for (i <- 5L to 9L; j <- 5L to 9L if i < j) yield (i, j)
    val und = (cliqueA ++ cliqueB :+ (4L, 5L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val lab = (0L to 9L).map(n => n -> (if (n <= 4) 0L else 1L)).toMap
    val m = und.length.toLong
    val s = edges.groupBy(e => lab(e._1)).map { case (c, es) =>
      val dc = es.length.toLong
      val intra2 = es.count(e => lab(e._2) == c).toLong
      2 * m * intra2 - dc * dc
    }.sum
    val q = s.toDouble / (4.0 * m * m)
    assert(q > 0.4, s"two-clique modularity should be high, got $q")
  }
}
