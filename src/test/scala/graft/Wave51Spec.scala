package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries => P, CoreQueries => C}

/** Wave 51 (q452-q454): in-engine AdaBoost stumps and the trained-
  * propensity IPW estimator — full numeric replays on the driver. */
class Wave51Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rnd(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    if (x < 0) -math.floor(-x * p + 0.5) / p else math.floor(x * p + 0.5) / p
  }
  private def roundL(x: Double): Long =
    if (x < 0) -math.floor(-x + 0.5).toLong else math.floor(x + 0.5).toLong
  private def pct(sorted: Array[Double], p: Double): Double = {
    val pos = (sorted.length - 1) * p
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }
  private def toks(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Driver replay of the full 3-round boost over sf0.001. */
  private lazy val replay: (Array[(Long, Int, Array[Double])],
      Seq[(Int, Int, Double, Int, Double, Double)]) = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map { r =>
        val text = r.getString(2)
        val f = Array(toks(text).length.toDouble, r.getLong(3).toDouble,
          toks(text.trim.toLowerCase).distinct.length.toDouble)
        (r.getLong(0), if (r.getString(1) == "en") 1 else -1, f)
      }
    val hyp = (1 to 3).flatMap { feat =>
      val sorted = docs.map(_._3(feat - 1)).sorted
      (1 to 15).map(k => (feat, rnd(pct(sorted, k / 16.0), 4)))
    }.distinct.flatMap { case (f, t) => Seq((f, t, 1), (f, t, -1)) }
    var w = docs.map(_ => 1.0)
    val stumps = (1 to 3).map { t =>
      val errs = hyp.map { case (feat, thr, pol) =>
        var mw = BigDecimal(0); var tw = BigDecimal(0)
        docs.indices.foreach { i =>
          val h = if (docs(i)._3(feat - 1) <= thr) pol else -pol
          val wd = BigDecimal(w(i))
          tw += wd
          if (h != docs(i)._2) mw += wd
        }
        (feat, thr, pol, rnd(mw.toDouble / tw.toDouble, 6))
      }
      val (feat, thr, pol, err) = errs.minBy(e => (e._4, e._1, e._2, e._3))
      val ec = math.min(math.max(err, 0.000001), 0.999999)
      val alpha = rnd(0.5 * math.log((1.0 - ec) / ec), 6)
      w = docs.indices.map { i =>
        val h = if (docs(i)._3(feat - 1) <= thr) pol else -pol
        rnd(w(i) * (if (h != docs(i)._2) math.exp(alpha)
          else math.exp(-alpha)), 6)
      }.toArray
      (t, feat, thr, pol, err, alpha)
    }
    (docs, stumps)
  }

  test("q452: stump sequence matches the driver replay; errors <= 1/2") {
    val (_, stumps) = replay
    val got = P.adaStumps(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == stumps)
    // a polarity pair always brackets 1/2, so the argmin is <= 1/2
    got.foreach { s => assert(s._5 <= 0.5 + 1e-9) }
  }

  test("q453: additive scores and sign predictions match the replay") {
    val (docs, stumps) = replay
    val got = P.adaScores(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getInt(3)))
      .toMap
    docs.foreach { case (id, y, f) =>
      val raw = stumps.map { case (_, feat, thr, pol, _, a) =>
        a * (if (f(feat - 1) <= thr) pol else -pol)
      }.reduceLeft(_ + _)
      assert(got(id) == ((y, rnd(raw, 4), if (raw >= 0) 1 else -1)),
        s"at doc $id")
    }
  }

  test("q454: IPW chain matches a full driver replay of the trained propensity") {
    val rows = graft.sources.Tables.orders(spark, dir)
      .join(graft.sources.Tables.customer(spark, dir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr("o_orderkey", "c_mktsegment", "c_acctbal", "o_totalprice")
      .collect()
      .map { r =>
        val y = if (r.getString(1) == "BUILDING") 1L else 0L
        val yc = math.round(r.getDouble(3) * 100)
        val bal = math.round(r.getDouble(2) * 100)
        val j = math.min(7, math.max(0,
          math.floor((bal + 100000).toDouble / 137500.0).toInt))
        (y, yc, j)
      }
    val n = rows.length
    // micro-unit GD, 3 rounds, lr 0.5 (each unit has ONE bin feature)
    var wu = Array.fill(8)(0L); var bu = 0L
    for (_ <- 1 to 3) {
      val e = rows.map { case (y, _, j) =>
        val z = (bu + wu(j)).toDouble / 1e6
        val p = 1.0 / (1.0 + math.exp(-z))
        (math.floor(p * 1e6 + 0.5).toLong - y * 1000000L, j)
      }
      val gj = e.groupBy(_._2).map { case (j, g) => j -> g.map(_._1).sum }
      val gb = e.map(_._1).sum
      wu = wu.zipWithIndex.map { case (w, j) =>
        w - roundL(0.5 * gj.getOrElse(j, 0L).toDouble / n) }
      bu -= roundL(0.5 * gb.toDouble / n)
    }
    var syt, swt, syc, swc = BigDecimal(0)
    var syn, scn, nT = 0L
    var eMin = 2.0; var eMax = -1.0
    rows.foreach { case (y, yc, j) =>
      val z = (bu + wu(j)).toDouble / 1e6
      val pu = math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5).toLong
      val eu = math.min(math.max(pu, 1L), 999999L)
      val e = eu.toDouble / 1e6
      eMin = math.min(eMin, e); eMax = math.max(eMax, e)
      val yd = yc.toDouble / 100
      if (y == 1L) {
        nT += 1; syn += yc
        syt += BigDecimal(rnd(yd / e, 6)); swt += BigDecimal(rnd(1.0 / e, 6))
      } else {
        scn += yc
        val ce = (1000000L - eu).toDouble / 1e6
        syc += BigDecimal(rnd(yd / ce, 6)); swc += BigDecimal(rnd(1.0 / ce, 6))
      }
    }
    val exp = (n.toLong, nT,
      rnd(syt.toDouble / swt.toDouble, 4),
      rnd(syc.toDouble / swc.toDouble, 4),
      rnd(syt.toDouble / swt.toDouble - syc.toDouble / swc.toDouble, 4),
      rnd(syn.toDouble / nT / 100 - scn.toDouble / (n - nT) / 100, 4),
      rnd(eMin, 6), rnd(eMax, 6))
    val r = C.ipwAte(spark, dir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(got == exp)
    // positivity trim held and the propensities are non-degenerate
    assert(got._7 >= 1e-6 && got._8 <= 1 - 1e-6 && got._7 <= got._8)
  }
}
