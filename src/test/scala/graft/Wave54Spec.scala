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
    val res = P.knnEval(spark, dir).collect()
    val (ovRows, clsRows) = res.partition(_.getBoolean(1))
    val got = clsRows
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    perClass.foreach { case (l, v) => assert(got(l) == v, s"at class $l") }
    // the overall row is marked is_overall=true with a NULL label (no
    // -1 sentinel — a legitimate -1 class must stay distinguishable)
    assert(ovRows.length == 1 && ovRows.head.isNullAt(0))
    assert((ovRows.head.getLong(2), ovRows.head.getLong(3),
      ovRows.head.getDouble(4)) ==
      ((rows.length.toLong, nOk.toLong, rnd(nOk.toDouble / rows.length, 4))))
    // the per-class rows partition the corpus and accuracies are
    // proper fractions. (On THIS synthetic corpus the labels are
    // independent of the vectors, so LOO accuracy sits at the ~1/10
    // chance level — the eval's honest reading; the operator's job is
    // to report that number, and the replay above proves it exact.)
    assert(got.values.map(_._1).sum == rows.length)
    got.values.foreach { case (n, ok, acc) =>
      assert(ok <= n && acc >= 0.0 && acc <= 1.0)
    }
  }

  private def md5Long(s: String, hexDigits: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(hexDigits / 2).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
  }
  private def roundL(x: Double): Long =
    if (x < 0) -math.floor(-x + 0.5).toLong else math.floor(x + 0.5).toLong

  test("q462: fold accuracies match a full driver replay of both GD runs") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val toks = {
          val t = r.getString(2).trim.toLowerCase
          if (t.isEmpty) Array.empty[String] else t.split("\\s+")
        }
        val js = toks.map(w => (md5Long(s"lrf:$w", 8) % 32).toInt).distinct
        (r.getLong(0), if (r.getString(1) == "en") 1L else 0L,
          md5Long(s"split:${r.getLong(0)}", 8) % 100 < 50, js)
      }
    def train(fold: Array[(Long, Long, Boolean, Array[Int])])
        : (Array[Long], Long) = {
      var wu = Array.fill(32)(0L); var bu = 0L
      val n = fold.length
      for (_ <- 1 to 3) {
        val es = fold.map { case (_, y, _, js) =>
          val z = (bu + js.map(wu(_)).sum).toDouble / 1e6
          val p = 1.0 / (1.0 + math.exp(-z))
          (math.floor(p * 1e6 + 0.5).toLong - y * 1000000L, js)
        }
        val gj = Array.fill(32)(0L)
        es.foreach { case (e, js) => js.foreach(j => gj(j) += e) }
        val gb = es.map(_._1).sum
        wu = wu.zipWithIndex.map { case (w, j) =>
          w - roundL(0.5 * gj(j).toDouble / n) }
        bu -= roundL(0.5 * gb.toDouble / n)
      }
      (wu, bu)
    }
    def rnd4(x: Double): Double =
      if (x < 0) -math.floor(-x * 1e4 + 0.5) / 1e4
      else math.floor(x * 1e4 + 0.5) / 1e4
    val expected = Seq(("a", true), ("b", false)).map { case (f, flagA) =>
      val (wu, bu) = train(docs.filter(_._3 == flagA))
      val scored = docs.map { case (_, y, ina, js) =>
        val z = (bu + js.map(wu(_)).sum).toDouble / 1e6
        val pred = if (1.0 / (1.0 + math.exp(-z)) >= 0.5) 1L else 0L
        (ina, pred == y)
      }
      val (tr, te) = scored.partition(_._1 == flagA)
      val accTr = rnd4(tr.count(_._2).toDouble / tr.length)
      val accTe = rnd4(te.count(_._2).toDouble / te.length)
      f -> (tr.length.toLong, te.length.toLong, accTr, accTe,
        rnd4(accTr - accTe))
    }.toMap
    val got = graft.operators.PipelineQueries.lrCrossVal(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got == expected)
    // the folds partition the corpus
    assert(got("a")._1 + got("b")._1 == docs.length)
    assert(got("a")._1 == got("b")._2)
  }
}
