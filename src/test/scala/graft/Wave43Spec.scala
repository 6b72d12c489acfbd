package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C, PipelineQueries => P}

/** Wave 43 (q398–q403): isotonic calibration, exact CUSUM, average
  * precision, bootstrap CI, quota apportionment, MinHash estimator
  * audit — each checked against an independent driver-side
  * re-implementation (sequential PAV, the direct CUSUM recursion, a
  * hand AP fold) rather than just shape. */
class Wave43Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q398: iso_rate is monotone and equals sequential weighted PAV") {
    val rows = C.isotonicCalibration(spark, dir)
      .select("b", "n", "k", "iso_rate").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // monotone non-decreasing (the isotonic constraint itself)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4 + 1e-9, s"iso not monotone at ${b._1}")
    }
    // sequential pool-adjacent-violators on the same bins
    case class Block(var w: Long, var s: Long)
    val st = scala.collection.mutable.Stack[Block]()
    rows.foreach { case (_, n, k, _) =>
      var blk = Block(n, k)
      while (st.nonEmpty &&
          st.top.s.toDouble / st.top.w >= blk.s.toDouble / blk.w) {
        val t = st.pop(); blk = Block(t.w + blk.w, t.s + blk.s)
      }
      st.push(blk)
    }
    val pav = st.toSeq.reverse.flatMap(b =>
      Seq.fill(b.w.toInt)(b.s.toDouble / b.w)) // per-event fit value
    // expand query result the same way and compare per-event at 4dp
    val got = rows.flatMap { case (_, n, _, iso) => Seq.fill(n.toInt)(iso) }
    assert(got.length == pav.length)
    got.zip(pav).foreach { case (g, p) =>
      assert(math.abs(g - p) < 5e-4, s"PAV mismatch: $g vs $p")
    }
  }

  test("q399: prefix-min closed form equals the direct CUSUM recursion") {
    val rows = C.cusumExact(spark, dir)
      .select("x", "s56", "alarm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // reconstruct A from the identity z56 = 56x - 5A on the first row:
    // s1 = max(0, z1) — recover A instead from the daily frame directly
    val daily = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    val a = daily.take(14).sum
    var s = 0L
    rows.zip(daily.drop(14)).foreach { case ((x, s56, alarm), xd) =>
      assert(x == xd)
      s = math.max(0L, s + 56 * x - 5 * a)
      assert(s56 == s, s"CUSUM recursion mismatch: $s56 vs $s")
      assert(alarm == (s > a * 20))
    }
    assert(rows.length == daily.length - 14)
  }

  test("q400: AP recomputed from the two legs; bounds hold") {
    val exact = P.cosineTopK(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = P.ivfTopK(spark, dir)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    val got = P.avgPrecision(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.size == 8)
    ivf.foreach { case (q, rows) =>
      var hits = 0L
      var apNum = 0L // 1e-6-pinned precision@r sum, the query's contract
      rows.sortBy(_._3).foreach { case (_, n, r) =>
        val rel = exact.contains((q, n))
        if (rel) hits += 1
        val pq = math.floor(hits * 1000000.0 / r + 0.5).toLong
        if (rel) apNum += pq
      }
      val (nh, ap, rp) = got(q)
      assert(nh == hits.toInt)
      assert(math.abs(ap - apNum / 5e6) < 5e-4)
      assert(rp >= 0.0 && rp <= 1.0 && ap >= 0.0 && ap <= 1.0)
      assert(math.abs(rp - hits / 5.0) < 5e-4) // R-prec = prec@5 here
    }
  }

  test("q401: bootstrap CI brackets are ordered and data-bounded") {
    val r = C.bootstrapCi(spark, dir).collect().head
    val (nDays, obs, b, lo, hi) = (r.getLong(0), r.getDouble(1),
      r.getInt(2), r.getDouble(3), r.getDouble(4))
    assert(nDays == 30 && b == 200)
    assert(lo <= hi)
    // resample means live inside the daily min/max envelope
    val daily = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts"))).agg(count(lit(1)).as("x"))
      .select("x").collect().map(_.getLong(0))
    assert(lo >= daily.min.toDouble && hi <= daily.max.toDouble)
    assert(math.abs(obs - daily.sum.toDouble / daily.length) < 5e-4)
  }

  test("q402: both methods allocate exactly 20 seats; Hamilton stays within floor..floor+1") {
    val rows = C.quotaApportion(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3), r.getInt(4),
        r.getInt(5)))
    assert(rows.map(_._4).sum == 20, "Hamilton seats must sum to budget")
    assert(rows.map(_._5).sum == 20, "d'Hondt seats must sum to budget")
    rows.foreach { case (src, _, fl, ham, _) =>
      assert(ham == fl || ham == fl + 1, s"$src Hamilton outside quota rule")
    }
  }

  test("q404: TextRank emits a ranked 20-term head with descending scores") {
    val rows = P.textrankKeywords(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    assert(rows.length == 20)
    assert(rows.map(_._3).toSeq == (1 to 20))
    assert(rows.map(_._1).distinct.length == 20)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1),
        "scores must be non-increasing with term tie-break")
    }
    // keywords must actually be vocabulary terms (count >= 5)
    val vocab = graft.sources.Tables.documents(spark, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .groupBy("t").count().filter(col("count") >= 5)
      .select("t").collect().map(_.getString(0)).toSet
    rows.foreach { case (t, _, _) => assert(vocab.contains(t)) }
  }

  test("q405: forward scores equal the direct min-sum recursion; decode is argmin") {
    val daily = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    val a = daily.take(14).sum
    var vb = 0L; var ve = 0L
    val want = daily.slice(14, 30).zipWithIndex.map { case (x, t) =>
      val (eb, ee) = (math.abs(14 * x - a), math.abs(14 * x - 2 * a))
      if (t == 0) { vb = eb; ve = ee }
      else { val nb = eb + math.min(vb, ve + a)
        val ne = ee + math.min(ve, vb + a); vb = nb; ve = ne }
      (x, vb, ve, if (vb <= ve) "base" else "elevated")
    }.toSeq
    val got = C.viterbiDecode(spark, dir)
      .select("x", "v_base", "v_elev", "state")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(got == want)
  }

  test("q406: DBSCAN invariants — core density, gap separation, border reach, noise isolation") {
    val rows = C.dbscanDaily(spark, dir).collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getBoolean(5)))
    val xs = rows.map(_._1)
    val eps = (xs.max - xs.min) / 10 + 1
    rows.foreach { case (x, nbrs, isCore, cid, isNoise) =>
      assert(nbrs == xs.count(y => math.abs(x - y) <= eps))
      assert(isCore == (nbrs >= 3))
      if (isCore) assert(cid.isDefined && !isNoise)
      if (isNoise) assert(cid.isEmpty &&
        !rows.exists(c => c._3 && math.abs(c._1 - x) <= eps))
    }
    // same-cluster cores are gap-chained; different clusters separated
    val cores = rows.filter(_._3).sortBy(_._1)
    cores.sliding(2).foreach { case Array(p, q) =>
      if (p._4 == q._4) assert(q._1 - p._1 <= eps)
      else assert(q._1 - p._1 > eps)
    }
  }

  test("q407: skyline contains exactly the non-dominated customers") {
    val per = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(p: (Long, Long, Long)) = per.exists(q =>
      q._1 != p._1 && q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3))
    val want = per.filterNot(dominated).map(_._1).toSet
    val got = C.skylineCustomers(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q408: smoothed path equals the direct Holt recursion at 4dp") {
    val daily = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    var l = daily(0).toDouble
    var b = (daily(1) - daily(0)).toDouble
    val want = daily.slice(2, 18).map { x =>
      val lp = l
      l = (x + l + b) / 2.0
      b = (l - lp) / 2.0 + b / 2.0
      (x, l, b, l + b)
    }
    val got = C.holtLinear(spark, dir)
      .select("x", "level", "trend", "forecast_next").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gx, gl, gt, gf), (wx, wl, wt, wf)) =>
      assert(gx == wx)
      assert(math.abs(gl - wl) < 5e-4 && math.abs(gt - wt) < 5e-4 &&
        math.abs(gf - wf) < 1e-3)
    }
  }

  test("q409: chosen segmentation achieves the brute-force minimal SSE") {
    val xs = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    def sse(a: Int, b: Int) = { // [a, b) 0-based
      val seg = xs.slice(a, b)
      val m = seg.sum / seg.length
      seg.map(v => (v - m) * (v - m)).sum
    }
    val n = xs.length
    val best = (for {
      i <- 1 until n; j <- i + 1 until n; k <- j + 1 until n
    } yield sse(0, i) + sse(i, j) + sse(j, k) + sse(k, n)).min
    val rows = C.optimalSegments(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(3)).sum == n) // segments partition days
    val gotSse = rows.head.getDouble(5)
    assert(math.abs(gotSse - best) < 1e-2,
      s"segmentation SSE $gotSse vs brute-force $best")
  }

  test("q403: estimator error bounded; estimates are exact match-count ratios") {
    val rows = P.minhashEstimatorAudit(spark, dir).collect()
      .map(r => (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (jx, m, je, err) =>
      assert(jx >= 0.3 && m >= 0 && m <= 64)
      assert(math.abs(je - m / 64.0) < 5e-4)
      // 64 hashes: σ <= 0.0625; 0.35 is > 5σ — a failure means the
      // hash family or banding broke, not noise
      assert(err <= 0.35, s"estimator error $err implausible for J=$jx")
    }
  }
}
