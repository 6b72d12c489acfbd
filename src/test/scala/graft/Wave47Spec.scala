package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C, PipelineQueries => P}

/** Wave 47 (q418–q420): personalized PageRank, the Chow break test,
  * and G² collocations — each replayed independently on the driver. */
class Wave47Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    if (x < 0) -math.floor(-x * 1e6 + 0.5) / 1e6
    else math.floor(x * 1e6 + 0.5) / 1e6

  test("q418: PPR equals a driver-side seeded power iteration; non-seed-reachable mass is 0") {
    val pairs = graft.sources.Tables.lineitem(spark, dir)
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap(e => Seq(e, e.swap))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val seeds = pairs.map(_._1).distinct.filter(_ % 100 == 0).toSet
    assert(seeds.nonEmpty)
    val od = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    var pr = nodes.map(n =>
      n -> (if (seeds(n)) r6(1.0 / seeds.size) else 0.0)).toMap
    for (_ <- 0 until 3) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => pr(e._1) / od(e._1)).sum
      }
      pr = nodes.map { n =>
        val tele = if (seeds(n)) 0.15 / seeds.size else 0.0
        n -> r6(tele + 0.85 * in.getOrElse(n, 0.0))
      }.toMap
    }
    val got = C.pprQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == nodes.length)
    got.foreach { case (n, v) =>
      assert(math.abs(v - pr(n)) < 5e-6, s"node $n: $v vs ${pr(n)}")
    }
    // total mass is bounded by 1 (walk + restart conserve ≤ 1)
    assert(got.map(_._2).sum <= 1.0 + 1e-3)
  }

  test("q419: Chow F equals a BigInt-sum replication") {
    val daily = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("y"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = daily.length
    val mid = n / 2
    def sse(xs: Seq[(Long, Long)]): Double = {
      val m = BigInt(xs.size)
      val sx = xs.map(p => BigInt(p._1)).sum
      val sy = xs.map(p => BigInt(p._2)).sum
      val sxy = xs.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val sxx = xs.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = xs.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val a = m * sxx - sx * sx
      val b = m * sxy - sx * sy
      val c = m * syy - sy * sy
      (a.toDouble * c.toDouble - b.toDouble * b.toDouble) /
        (m.toDouble * a.toDouble)
    }
    val all = daily.zipWithIndex.map { case (y, i) => ((i + 1).toLong, y) }.toSeq
    val (ssep, sse1, sse2) =
      (sse(all), sse(all.take(mid)), sse(all.drop(mid)))
    val f = ((ssep - sse1 - sse2) / 2.0) / ((sse1 + sse2) / (n - 4).toDouble)
    val row = C.chowBreak(spark, dir).collect()(0)
    assert(row.getLong(0) == n && row.getLong(1) == mid)
    def r4(x: Double) = if (x < 0) -math.floor(-x * 1e4 + 0.5) / 1e4
      else math.floor(x * 1e4 + 0.5) / 1e4
    assert(row.getDouble(2) == r4(ssep))
    assert(row.getDouble(3) == r4(sse1))
    assert(row.getDouble(4) == r4(sse2))
    assert(math.abs(row.getDouble(5) - r4(f)) < 1e-9)
    assert(row.getBoolean(6) == (f > 5.0))
  }

  test("q421: sweep counts equal a sorted fold; best row maximizes F1") {
    val scored = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label")).collect()
      .map { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"cal:${r.getLong(0)}".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString.take(4)
        (java.lang.Long.parseLong(hex, 16) / 65536.0,
          if (r.getInt(1) < 5) 1L else 0L)
      }
    val pAll = scored.map(_._2).sum
    val grid = scored.groupBy(_._1).toSeq.sortBy(-_._1)
    var (cn, cp) = (0L, 0L)
    val exp = grid.map { case (t, rows) =>
      cn += rows.length; cp += rows.map(_._2).sum
      (t, cn, cp, 2.0 * cp / (cn + pAll))
    }
    val got = P.f1Sweep(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getBoolean(6)))
    assert(got.length == exp.length)
    got.sortBy(-_._1).zip(exp).foreach { case ((t, n, tp, _, _), (te, ne, tpe, _)) =>
      assert(t == te && n == ne && tp == tpe)
    }
    val bestF1 = exp.map(_._4).max
    val bests = got.filter(_._5)
    assert(bests.length == 1)
    assert(math.abs(2.0 * bests(0)._3 / (bests(0)._2 + pAll) - bestF1) < 1e-12)
  }

  test("q422: sliding P95 is the exact windowed order statistic") {
    val daily = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    val got = graft.operators.CoreQueries.slidingP95(spark, dir).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.length == daily.length)
    got.zipWithIndex.foreach { case ((x, nw, p95), i) =>
      val win = daily.slice(math.max(0, i - 6), i + 1).sorted
      assert(x == daily(i) && nw == win.length)
      assert(p95 == win(math.ceil(win.length * 0.95).toInt - 1))
    }
  }

  test("q420: G² equals a driver-side contingency computation and is non-negative") {
    val arrs = graft.sources.Tables.documents(spark, dir)
      .select(graft.functions.TextFunctions.tokens(lower(col("text"))).as("a"))
      .collect().map(_.getSeq[String](0))
    val bg = arrs.filter(_.length >= 2)
      .flatMap(a => a.sliding(2).map(p => (p(0), p(1))))
    val nTot = bg.length.toLong
    val ca = bg.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cb = bg.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    def g2(w1: String, w2: String, cab: Long): Double = {
      val (a, b) = (ca(w1), cb(w2))
      def ll(o: Long, e: Double) =
        if (o > 0) o.toDouble * math.log(o.toDouble / e) else 0.0
      2.0 * (ll(cab, a.toDouble * b / nTot) +
        ll(a - cab, a.toDouble * (nTot - b) / nTot) +
        ll(b - cab, (nTot - a).toDouble * b / nTot) +
        ll(nTot - a - b + cab, (nTot - a).toDouble * (nTot - b) / nTot))
    }
    val cab = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = P.bigramG2Top(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (w1, w2, c, g) =>
      assert(c == cab((w1, w2)))
      assert(g >= 0.0)
      assert(math.abs(g - g2(w1, w2, c)) < 5e-4, s"($w1,$w2): $g")
    }
    // the ranking is the top of the full >= 5 candidate set
    val full = cab.filter(_._2 >= 5).map { case ((w1, w2), c) =>
      (w1, w2, g2(w1, w2, c))
    }.toSeq.sortBy { case (w1, w2, g) => (-g, w1, w2) }
    assert(got.map(t => (t._1, t._2)).toSeq ==
      full.take(got.length).map(t => (t._1, t._2)))
  }
}
