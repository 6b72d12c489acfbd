package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q304 MMR diversified retrieval: independent plain-Scala greedy
  * recompute (no shared code) + the diversification property. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("q304: picks match an independent greedy recompute") {
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      round4(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    def expected(qid: Long): Seq[(Int, Long, Double)] = {
      val qe = vecs(qid)
      val cand = vecs.toSeq.filter(_._1 != qid)
        .map { case (cid, ce) => (cid, cos(qe, ce)) }
        .sortBy { case (cid, rel) => (-rel, cid) }.take(12)
      val sel = scala.collection.mutable.ArrayBuffer(
        (1, cand.head._1, cand.head._2))
      for (k <- 2 to 5) {
        val picked = sel.map(_._2).toSet
        val best = cand.filterNot(c => picked(c._1)).map { case (cid, rel) =>
          val ms = sel.map(s => cos(vecs(cid), vecs(s._2))).max
          (cid, rel - ms)
        }.minBy { case (cid, gain) => (-gain, cid) }
        sel += ((k, best._1, best._2))
      }
      sel.toSeq
    }
    val out = SparkEntry.queries("q304_mmr_select")(spark, dir)
      .select("qid", "pick", "cid", "gain")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (qid, rows) =>
      val got = rows.sortBy(_._2).map(r => (r._2, r._3, round4(r._4))).toSeq
      val exp = expected(qid).map { case (p, c, g) => (p, c, round4(g)) }
      assert(got == exp, s"query $qid: got $got expected $exp")
    }
  }

  test("q304: diversification actually diverges from plain top-5") {
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      round4(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    val out = SparkEntry.queries("q304_mmr_select")(spark, dir)
      .select("qid", "pick", "cid")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    // for at least one query the MMR SET must differ from the plain
    // rel-top-5 set (else the operator is a relabeled top-k)
    val diverged = out.count { case (qid, rows) =>
      val qe = vecs(qid)
      val top5 = vecs.toSeq.filter(_._1 != qid)
        .map { case (cid, ce) => (cid, cos(qe, ce)) }
        .sortBy { case (cid, rel) => (-rel, cid) }.take(5).map(_._1).toSet
      rows.map(_._3).toSet != top5
    }
    assert(diverged > 0, "MMR never diverged from plain top-5")
  }
}
