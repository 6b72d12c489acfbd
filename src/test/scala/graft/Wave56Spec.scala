package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries => P}

/** Wave 56 (q465): unified decontamination verdict — leg coherence.
  * The verdict table must be EXACTLY the union of its two legs with
  * faithful attribution: every q61 n-gram hit appears with its
  * n_overlap, every q82 semantic hit with its (bench_id, best_cos),
  * nothing else appears, and the method column matches the membership
  * pattern. (Value-level correctness of each leg is gated separately
  * by the q61/q82/q114 oracles; this pins the join/attribution
  * layer.) */
class Wave56Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("q465: verdict rows = ngram-leg ∪ semantic-leg with faithful attribution") {
    val ng = P.decontaminate(spark, dir)
      .as[(Long, Long)].collect().toMap
    val sem = P.semanticDecon(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val v = P.deconVerdict(spark, dir).collect()

    // exact row set: one row per flagged doc, no clean docs
    assert(v.map(_.getLong(0)).toSet == ng.keySet ++ sem.keySet)
    assert(v.length == (ng.keySet ++ sem.keySet).size)

    v.foreach { r =>
      val id = r.getLong(0)
      val inNg = ng.contains(id)
      val inSem = sem.contains(id)
      assert(r.getBoolean(4) == inNg, s"ngram_hit wrong for $id")
      assert(r.getBoolean(5) == inSem, s"semantic_hit wrong for $id")
      assert(r.getLong(1) == ng.getOrElse(id, 0L), s"n_overlap wrong for $id")
      if (inSem) {
        assert((r.getLong(2), r.getDouble(3)) == sem(id))
        assert(r.getDouble(3) >= 0.8)
      } else assert(r.isNullAt(2) && r.isNullAt(3))
      val want =
        if (inNg && inSem) "ngram+semantic"
        else if (inNg) "ngram" else "semantic"
      assert(r.getString(6) == want, s"method wrong for $id")
    }
    // ordered by doc_id (the driver-contract convention)
    assert(v.map(_.getLong(0)).toSeq == v.map(_.getLong(0)).sorted.toSeq)
    // both legs actually contribute on this corpus — the test is
    // vacuous otherwise
    assert(ng.nonEmpty && sem.nonEmpty)
  }

  private def rnd6(x: Double): Double =
    if (x < 0) -math.floor(-x * 1e6 + 0.5) / 1e6
    else math.floor(x * 1e6 + 0.5) / 1e6

  test("q466: per-label quantized centroid sums match a driver replay") {
    val rows = graft.sources.Tables.embeddings(spark, dir)
      .selectExpr("label", "cast(embedding as array<double>)")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val want = rows.groupBy(_._1).flatMap { case (lab, g) =>
      val dims = g.head._2.length
      (0 until dims).map { d =>
        val qsum = g.map(v =>
          math.floor(v._2(d) * 10000 + 0.5).toLong).sum
        (lab, d) -> ((g.length.toLong, qsum,
          rnd6(qsum.toDouble / g.length / 10000.0)))
      }
    }
    val got = P.labelCentroids(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want)
    // every (label, dim) cell present exactly once
    assert(got.size == rows.map(_._1).distinct.length * rows.head._2.length)
  }
}
