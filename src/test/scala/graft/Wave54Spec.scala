package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries => P}

/** Wave 54 (q461): leave-one-out k-NN classifier eval — driver replay
  * from raw embeddings. */
class Wave54Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rnd(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    if (x < 0) -math.floor(-x * p + 0.5) / p else math.floor(x * p + 0.5) / p
  }

  test("q461: LOO 5-NN majority vote matches a driver replay") {
    val rows = graft.sources.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "cast(embedding as array<double>)", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val pred = rows.map { case (id, v, _) =>
      val nn = rows.filter(_._1 != id)
        .map(o => (cos(v, o._2), o._1, o._3))
        .sortBy(t => (-t._1, t._2)).take(5)
      val vote = nn.groupBy(_._3).map { case (l, g) => (l, g.length) }
        .toSeq.minBy(t => (-t._2, t._1))._1
      id -> vote
    }.toMap
    val truth = rows.map(r => r._1 -> r._3).toMap
    val perClass = rows.groupBy(_._3).map { case (l, g) =>
      val correct = g.count(r => pred(r._1) == l)
      l -> (g.length.toLong, correct.toLong,
        rnd(correct.toDouble / g.length, 4))
    }
    val nOk = rows.count(r => pred(r._1) == truth(r._1))
    val got = P.knnEval(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    perClass.foreach { case (l, v) => assert(got(l) == v, s"at class $l") }
    assert(got(-1) ==
      ((rows.length.toLong, nOk.toLong, rnd(nOk.toDouble / rows.length, 4))))
    // the per-class rows partition the corpus and accuracies are
    // proper fractions. (On THIS synthetic corpus the labels are
    // independent of the vectors, so LOO accuracy sits at the ~1/10
    // chance level — the eval's honest reading; the operator's job is
    // to report that number, and the replay above proves it exact.)
    assert(got.filterKeys(_ >= 0).values.map(_._1).sum == rows.length)
    got.values.foreach { case (n, ok, acc) =>
      assert(ok <= n && acc >= 0.0 && acc <= 1.0)
    }
  }
}
