package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 inference/curation wave (q289–q296). Value truth is the
  * DuckDB oracle; these pin each statistic against an INDEPENDENT
  * plain-Scala recompute from the raw tables (no shared code with the
  * operators) plus the structural invariants. */
class InferenceWaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private lazy val clickView: (Array[Double], Array[Double]) = {
    val rows = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").as[(String, Double)].collect()
    (rows.filter(_._1 == "click").map(_._2),
      rows.filter(_._1 == "view").map(_._2))
  }

  test("q289: U and z match a direct midrank computation") {
    val (a, b) = clickView
    val all = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    // midranks via tie groups
    val rank = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    var ties = 0L
    while (i < all.length) {
      var j = i
      while (j < all.length && all(j)._1 == all(i)._1) j += 1
      val t = j - i
      rank(all(i)._1) = (i + 1 + j).toDouble / 2 // avg of ranks i+1..j
      ties += t.toLong * t * t - t
      i = j
    }
    val r1 = a.map(rank).sum
    val (n1, n2) = (a.length.toDouble, b.length.toDouble)
    val u1 = r1 - n1 * (n1 + 1) / 2
    val mu = n1 * n2 / 2
    val vr = n1 * n2 / 12 *
      ((n1 + n2 + 1) - ties / ((n1 + n2) * (n1 + n2 - 1)))
    val got = SparkEntry.queries("q289_mann_whitney")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == a.length && got._2 == b.length)
    assert(math.abs(got._3 - u1) < 1e-6, s"u1 ${got._3} vs $u1")
    assert(math.abs(got._4 - (u1 - mu) / math.sqrt(vr)) < 1e-3)
  }

  test("q290: CvM T matches a direct pooled-ECDF recompute") {
    val (a, b) = clickView
    val pooled = a ++ b
    val n1 = a.length.toLong
    val n2 = b.length.toLong
    var s = BigInt(0)
    for (v <- pooled.distinct) {
      val g = BigInt(a.count(_ <= v).toLong * n2 - b.count(_ <= v).toLong * n1)
      s += g * g * pooled.count(_ == v)
    }
    val t = s.toDouble / (n1.toDouble * n2) /
      ((n1 + n2).toDouble * (n1 + n2))
    val got = SparkEntry.queries("q290_cvm_test")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == n1 && got._2 == n2)
    assert(got._3 == round4(t), s"T ${got._3} vs $t")
    assert(math.abs(got._4 - t / ((1.0 + 1.0 / (n1 + n2)) / 6.0)) < 1e-3)
  }

  test("q291: H matches a direct midrank recompute over all types") {
    val rows = graft.sources.Tables.events(spark, dir)
      .select("event_type", "value").as[(String, Double)].collect()
    val sorted = rows.map(_._2).sorted
    val rankOf = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    var ties = 0.0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j) == sorted(i)) j += 1
      val t = (j - i).toDouble
      rankOf(sorted(i)) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      ties += t * t * t - t
      i = j
    }
    val groups = rows.groupBy(_._1)
    val nN = sorted.length.toDouble
    val sumTerm = groups.values.map { g =>
      val r = g.map(x => rankOf(x._2)).sum
      r * r / g.length
    }.sum
    val hExp = 12.0 / (nN * (nN + 1)) * sumTerm - 3 * (nN + 1)
    val hAdj = hExp / (1 - ties / (nN * nN * nN - nN))
    val got = SparkEntry.queries("q291_kruskal_wallis")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == groups.size && got._2 == sorted.length)
    assert(math.abs(got._3 - hExp) < 1e-3, s"H ${got._3} vs $hExp")
    assert(math.abs(got._4 - hAdj) < 1e-3, s"H' ${got._4} vs $hAdj")
  }

  test("q292: CUSUM max and change day match a direct scan") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day")).count()
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.getTime)
    val xs = daily.map(_._2)
    val n = xs.length
    val sn = xs.sum
    var sk = 0L
    var best = -1L
    var bestDay: java.sql.Date = null
    for (k <- 1 to n) {
      sk += xs(k - 1)
      val gap = math.abs(n * sk - k * sn)
      if (gap > best) { best = gap; bestDay = daily(k - 1)._1 }
    }
    val got = SparkEntry.queries("q292_cusum_changepoint")(spark, dir)
      .as[(Long, Long, java.sql.Date, Double)].collect().head
    assert(got._1 == n && got._2 == sn)
    assert(got._3 == bestDay, s"change day ${got._3} vs $bestDay")
    assert(got._4 == round4(best.toDouble / n))
  }

  test("q293: coverage is monotone in V, bounded, totals constant") {
    val out = SparkEntry.queries("q293_vocab_coverage")(spark, dir)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(100, 500, 1000, 2000))
    assert(out.map(_._2).distinct.length == 1, "n_tokens must be constant")
    assert(out.sliding(2).forall(p => p(0)._3 <= p(1)._3),
      "covered must be monotone in V")
    out.foreach(r => assert(r._4 > 0 && r._4 <= 1.0))
    // independent coverage recompute at V=100
    val toks = graft.sources.Tables.documents(spark, dir)
      .select("text").as[String].collect()
      .flatMap(t => t.trim.toLowerCase match {
        case "" => Array.empty[String]
        case s => s.split("\\s+")
      })
    val counts = toks.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val cov100 = counts.take(100).map(_._2).sum.toDouble / toks.length
    assert(out.head._4 == round4(cov100), s"${out.head._4} vs $cov100")
  }

  test("q294: batch 0 novelty from doc_id order; fractions bounded") {
    val out = SparkEntry.queries("q294_ngram_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L to 4L))
    out.foreach { case (_, ns, nn, nov) =>
      assert(nn <= ns && nov >= 0 && nov <= 1)
    }
    // independent recompute of the full table
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect()
    def sh4(t: String): Seq[String] = {
      val toks = t.trim match {
        case "" => Array("")
        case s => s.split("\\s+")
      }
      if (toks.length >= 4)
        toks.sliding(4).map(_.mkString(" ")).toSeq.distinct
      else Seq(toks.mkString(" "))
    }
    val occ = docs.flatMap { case (id, t) => sh4(t).map((id % 5, _)) }
    val first = occ.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val expect = occ.groupBy(_._1).map { case (b, os) =>
      (b, os.length.toLong, os.count(o => first(o._2) == b).toLong)
    }.toSeq.sortBy(_._1)
    expect.zip(out).foreach { case ((b, ns, nn), got) =>
      assert(got._1 == b && got._2 == ns && got._3 == nn,
        s"batch $b: got $got expected ($ns, $nn)")
    }
  }

  test("q295: spam rate matches a direct trigram-multiplicity recompute") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
      .filter(_._3.length >= 3)
    val perSrc = docs.groupBy(_._2).map { case (src, ds) =>
      val ratios = ds.map { case (_, _, t) =>
        val tris = (0 to t.length - 3).map(i => t.substring(i, i + 3))
        val maxMult = tris.groupBy(identity).values.map(_.size).max
        maxMult.toDouble / tris.length
      }
      (src, (ds.length.toLong, ratios.count(_ > 0.05).toLong))
    }
    val out = SparkEntry.queries("q295_template_spam")(spark, dir)
      .select("source", "n_docs", "n_spam")
      .as[(String, Long, Long)].collect()
    out.foreach { case (src, nd, nspam) =>
      val (ed, espam) = perSrc(src)
      assert(nd == ed && nspam == espam, s"$src: ($nd,$nspam) vs ($ed,$espam)")
    }
  }

  test("q296: cosine bounded, vecs conserved, drift matches one label") {
    val out = SparkEntry.queries("q296_label_drift")(spark, dir)
      .as[(Int, Long, Double, Double)].collect()
    val total = graft.sources.Tables.embeddings(spark, dir).count()
    assert(out.map(_._2).sum == total)
    out.foreach { case (_, _, cos, l2) =>
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9 && l2 >= 0)
    }
    // independent recompute for the smallest label id
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding").cast("array<double>"))
      .as[(Int, Seq[Double])].collect()
    val dims = vecs.head._2.length
    val lab = out.map(_._1).min
    val mine = vecs.filter(_._1 == lab).map(_._2)
    val c = (0 until dims).map(d => mine.map(_(d)).sum / mine.length)
    val g = (0 until dims).map(d => vecs.map(_._2(d)).sum / vecs.length)
    val cos = (0 until dims).map(d => c(d) * g(d)).sum /
      (math.sqrt(c.map(x => x * x).sum) * math.sqrt(g.map(x => x * x).sum))
    val got = out.find(_._1 == lab).get
    assert(math.abs(got._3 - cos) < 1e-3, s"cos ${got._3} vs $cos")
  }
}
