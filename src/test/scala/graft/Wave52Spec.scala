package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries => P}

/** Wave 52 (q455-q456): residual-quantization distortion and the
  * quality-signal agreement audit — driver replays. */
class Wave52Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rnd(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    if (x < 0) -math.floor(-x * p + 0.5) / p else math.floor(x * p + 0.5) / p
  }

  private def md5Long(s: String, hexDigits: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(hexDigits / 2).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
  }

  private def sqd(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def assign(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue
    cs.indices.foreach { c =>
      val d = sqd(v, cs(c)); if (d < bd) { bd = d; best = c }
    }
    best
  }

  private def lloyd(vs: Array[(Long, Array[Double])], nlist: Int,
      seed: Long, iters: Int): Array[Array[Double]] = {
    val dim = vs.head._2.length
    var cs = vs.map { case (id, v) => (md5Long(s"$seed:$id", 8), id, v) }
      .sortBy(t => (t._1, t._2)).take(nlist).map(_._3)
    for (_ <- 0 until iters) {
      val byCell = vs.groupBy { case (_, v) => assign(v, cs) }
      cs = cs.indices.map { c =>
        byCell.get(c) match {
          case Some(g) => Array.tabulate(dim)(j =>
            rnd(g.map(_._2(j)).sum / g.length, 6))
          case None => cs(c)
        }
      }.toArray
    }
    cs
  }

  test("q455: two-level RQ distortion matches a full driver replay") {
    val vs = graft.sources.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "cast(embedding as array<double>)").collect()
      .map { r =>
        val raw = r.getSeq[Double](1).toArray
        val n = math.sqrt(raw.map(x => x * x).sum)
        (r.getLong(0), raw.map(_ / n))
      }
    val c1 = lloyd(vs, 16, 42L, 3)
    val resid = vs.map { case (id, v) =>
      val cell1 = assign(v, c1)
      (id, cell1, v.indices.map(i => v(i) - c1(cell1)(i)).toArray)
    }
    val c2 = lloyd(resid.map(r => (r._1, r._3)), 16, 777L, 3)
    val expected = resid.groupBy(_._2).map { case (cell, g) =>
      val d1 = g.map(r => BigDecimal(rnd(r._3.map(x => x * x).sum, 8))).sum
      val d2 = g.map { r =>
        BigDecimal(rnd(sqd(r._3, c2(assign(r._3, c2))), 8))
      }.sum
      cell -> (g.length.toLong, rnd(d1.toDouble / g.length, 6),
        rnd(d2.toDouble / g.length, 6))
    }
    val got = P.rqDistortion(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (c, v) => assert(got(c) == v, s"at cell $c") }
    // the residual stage reduces total distortion (the reason RQ exists)
    val tot1 = got.values.map(v => v._2 * v._1).sum
    val tot2 = got.values.map(v => v._3 * v._1).sum
    assert(tot2 < tot1)
    assert(got.values.map(_._1).sum == vs.length)
  }

  test("q456: pairwise Pearson matches a replay from the gated signal queries") {
    val lm = P.knLm(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val lz = P.lzComplexity(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val q = graft.sources.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextFunctions.qualityScore(
          org.apache.spark.sql.functions.col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def corr(xs: Seq[(Double, Double)]): (Long, Double) = {
      val n = xs.length
      val sx = xs.map(p => BigDecimal(p._1)).sum.toDouble
      val sy = xs.map(p => BigDecimal(p._2)).sum.toDouble
      val sxx = xs.map(p => BigDecimal(rnd(p._1 * p._1, 8))).sum.toDouble
      val syy = xs.map(p => BigDecimal(rnd(p._2 * p._2, 8))).sum.toDouble
      val sxy = xs.map(p => BigDecimal(rnd(p._1 * p._2, 8))).sum.toDouble
      (n.toLong, rnd((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)), 4))
    }
    val ids = q.keys.toSeq
    val expected = Map(
      "lm_vs_lz" -> corr(ids.flatMap(i =>
        for (a <- lm(i); b <- lz(i)) yield (a, b))),
      "lm_vs_quality" -> corr(ids.flatMap(i =>
        for (a <- lm(i)) yield (a, q(i)))),
      "quality_vs_lz" -> corr(ids.flatMap(i =>
        for (b <- lz(i)) yield (q(i), b))))
    val got = P.signalAgreement(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected)
    // correlations are proper: |r| <= 1 and each pair saw most docs
    got.values.foreach { case (n, r) =>
      assert(math.abs(r) <= 1.0 && n > 100)
    }
  }

  test("q457: threshold sweep matches a replay from the gated q32 pairs") {
    val pairs = SparkEntry.queries("q32_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def bin(j: Double): Double =
      if (j < 0.6) 0.5 else if (j < 0.7) 0.6 else if (j < 0.8) 0.7
      else if (j < 0.9) 0.8 else 0.9
    val byBin = pairs.groupBy(p => bin(p._3))
    val got = P.jaccardSweep(spark, dir).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == byBin.keySet)
    byBin.foreach { case (b, ps) =>
      val docs = ps.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong
      val cum = pairs.count(p => bin(p._3) >= b).toLong
      assert(got(b) == ((ps.length.toLong, docs, cum)), s"at bin $b")
    }
    // the sweep covers the full gated pair set exactly once
    assert(got.values.map(_._1).sum == pairs.length)
  }
}
