package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries => P}

/** Wave 50 (q448-q450): CCNet perplexity filter buckets, SoftDeDup
  * down-weighting, Simple Good-Turing — each replayed on the driver
  * from raw collected rows. */
class Wave50Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rnd(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    if (x < 0) -math.floor(-x * p + 0.5) / p else math.floor(x * p + 0.5) / p
  }

  /** Spark Percentile's exact interpolation: pos = (n-1)p over the
    * sorted values, v(lo)*(hi-pos) + v(hi)*(pos-lo). */
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

  test("q448: buckets partition docs per lang; masses match a driver replay") {
    val lm = P.knLm(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byLang = docs.groupBy(_._2)
    val expected = byLang.flatMap { case (lang, ds) =>
      val scored = ds.flatMap(d => lm(d._1).map(v => (d._1, d._3, v)))
      val sorted = scored.map(_._3).sorted
      val b1 = rnd(pct(sorted, 0.25), 4)
      val b2 = rnd(pct(sorted, 0.75), 4)
      val rows = ds.map { case (id, _, text) =>
        val b = lm(id) match {
          case None => "unscored"
          case Some(v) if v <= b1 => "tail"
          case Some(v) if v <= b2 => "middle"
          case Some(_) => "head"
        }
        (b, toks(text).length.toLong, lm(id))
      }
      rows.groupBy(_._1).map { case (b, rs) =>
        val lp = rs.flatMap(_._3)
        val mean = if (lp.isEmpty) None
          else Some(rnd(lp.map(v => BigDecimal(rnd(v, 4)))
            .sum.toDouble / lp.length, 4))
        (lang, b) -> (rs.length.toLong, rs.map(_._2).sum, mean,
          b == "head" || b == "middle")
      }
    }
    val got = P.perplexityFilter(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"at $k") }
    // every doc lands in exactly one (lang, bucket) cell
    assert(got.values.map(_._1).sum == docs.length)
  }

  test("q449: effective mass matches a replay from the gated q49 components") {
    val comp = SparkEntry.queries("q49_dup_groups")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val csz = comp.values.groupBy(identity).map { case (c, m) => c -> m.size }
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2)).length.toLong))
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val eff = ds.map { case (id, _, t) =>
        val w = comp.get(id).map(c => 1.0 / csz(c)).getOrElse(1.0)
        BigDecimal(rnd(t.toDouble * w, 6))
      }.sum.toDouble
      src -> (ds.length.toLong, ds.count(d => comp.contains(d._1)).toLong,
        ds.map(_._3).sum, rnd(eff, 4))
    }
    val got = P.softDedup(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }.toMap
    assert(got == expected)
    // soft dedup never increases mass; duplicates strictly decrease it
    got.foreach { case (_, (_, nDup, raw, eff)) =>
      assert(eff <= raw + 1e-9)
      if (nDup > 0) assert(eff < raw)
    }
  }

  test("q450: Z_r, Turing r*, LGT fit and p0 match a driver replay") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val tri = docs.toSeq.flatMap { t =>
      val a = toks(t.trim.toLowerCase)
      if (a.length < 3) Seq.empty[String]
      else (0 until a.length - 2).map(i => s"${a(i)} ${a(i + 1)} ${a(i + 2)}")
    }
    val counts = tri.groupBy(identity).map(_._2.size.toLong)
    val nr = counts.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val rs = nr.keys.toArray.sorted
    def zOf(i: Int): Double = {
      val q = if (i == 0) 0L else rs(i - 1)
      val t = if (i == rs.length - 1) 2 * rs(i) - q else rs(i + 1)
      rnd(2.0 * nr(rs(i)) / (t - q).toDouble, 6)
    }
    val xs = rs.indices.map(i => rnd(math.log10(rs(i).toDouble), 6))
    val ys = rs.indices.map(i => rnd(math.log10(zOf(i)), 6))
    val n = rs.length.toDouble
    val sx = xs.map(BigDecimal(_)).sum.toDouble
    val sy = ys.map(BigDecimal(_)).sum.toDouble
    val sxx = xs.map(x => BigDecimal(rnd(x * x, 8))).sum.toDouble
    val sxy = xs.indices.map(i => BigDecimal(rnd(xs(i) * ys(i), 8))).sum.toDouble
    val b = rnd((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    val nTotal = nr.map { case (r, c) => r * c }.sum
    val p0 = rnd(nr.getOrElse(1L, 0L).toDouble / nTotal.toDouble, 6)
    val got = P.goodTuring(spark, dir).collect()
    assert(got.length == rs.count(_ <= 10))
    got.foreach { row =>
      val r = row.getLong(0)
      val i = rs.indexOf(r)
      assert(row.getLong(1) == nr(r))
      assert(row.getDouble(2) == zOf(i))
      if (nr.contains(r + 1))
        assert(row.getDouble(3) ==
          rnd((r + 1).toDouble * nr(r + 1).toDouble / nr(r).toDouble, 4))
      else assert(row.isNullAt(3))
      assert(row.getDouble(4) ==
        rnd(r.toDouble * math.pow((r + 1).toDouble / r.toDouble, b + 1.0), 4))
      assert(row.getDouble(5) == b)
      assert(row.getDouble(6) == p0)
    }
    // the count-1 tail must exist on this corpus (the reason trigrams
    // are the right universe) and the fitted Zipf-ish slope is negative
    assert(nr.contains(1L))
    assert(b < 0.0)
  }

  /** Reference LZ76 parse (naive, driver-side): shortest prefix of the
    * remaining suffix with no occurrence starting before the phrase. */
  private def lz76(s: String): Int = {
    val n = s.length
    var pos = 0; var c = 0
    while (pos < n) {
      var l = 1
      def occurs(l: Int): Boolean =
        (0 until pos).exists(st => s.regionMatches(st, s, pos, l))
      while (pos + l <= n && occurs(l)) l += 1
      pos += (if (pos + l <= n) l else n - pos)
      c += 1
    }
    c
  }

  test("q451: LZ76 matches the canonical example and a driver replay") {
    // Lempel & Ziv '76 §IV example: 0001101001000101 parses as
    // 0 | 001 | 10 | 100 | 1000 | 101 — six phrases
    assert(lz76("0001101001000101") == 6)
    import graft.expressions.LzComplexity
    import org.apache.spark.unsafe.types.UTF8String
    def nat(s: String) = LzComplexity.complexity(UTF8String.fromString(s), 120)
    assert(nat("0001101001000101") == 6)
    assert(nat("") == 0)
    assert(nat("a") == 1)
    assert(nat("aaaaaaaa") == 2) // a | aaaaaaa (self-referential copy)
    for (s <- Seq("abcabcabcabc", "the the the", "xyzzy plugh",
        "aabbaabbaabb", "0101010101", "qwerty"))
      assert(nat(s) == lz76(s), s"at '$s'")
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = graft.operators.PipelineQueries.lzComplexity(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    docs.foreach { case (id, text) =>
      val pre = text.substring(0, math.min(120, text.length))
      val n = pre.length
      val c = lz76(pre)
      val norm = if (n > 0)
        Some(rnd(c.toDouble * (math.log(n.toDouble) / math.log(2.0)) / n, 4))
      else None
      assert(got(id) == ((n, c, norm)), s"at doc $id")
    }
  }
}
