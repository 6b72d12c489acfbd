package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 wave 3 (q297–q301): block dedup, t-closeness, Wilcoxon
  * signed-rank, Brown–Forsythe, EWMA chart. Value truth is the DuckDB
  * oracle; these pin each result against an INDEPENDENT plain-Scala
  * recompute from the raw tables plus the structural invariants. */
class AuditWaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("q297: block dedup matches a direct first-occurrence recompute") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().sortBy(_._1)
    case class Occ(doc: Long, src: String, pos: Int, blk: String, btoks: Int)
    val occs = docs.flatMap { case (id, src, t) =>
      val toks = t.trim.toLowerCase.split("\\s+").filter(_ => t.trim.nonEmpty)
      if (toks.isEmpty) Array.empty[Occ]
      else toks.grouped(10).zipWithIndex.map { case (g, i) =>
        Occ(id, src, i, g.mkString(" "), g.length)
      }.toArray
    }
    val first = occs.groupBy(_.blk).view
      .mapValues(os => os.map(o => (o.doc, o.pos)).min).toMap
    val perSrc = occs.groupBy(_.src).map { case (src, os) =>
      val dups = os.filter(o => first(o.blk) != ((o.doc, o.pos)))
      (src, (os.length.toLong, dups.length.toLong,
        os.map(_.btoks.toLong).sum, dups.map(_.btoks.toLong).sum,
        dups.map(_.doc).distinct.length.toLong))
    }
    val out = SparkEntry.queries("q297_block_dedup")(spark, dir)
      .select("source", "n_blocks", "n_dup", "toks_total", "toks_dropped",
        "n_docs_hit")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, nb, nd, tt, td, hit) =>
      val (enb, end, ett, etd, ehit) = perSrc(src)
      assert((nb, nd, tt, td, hit) == ((enb, end, ett, etd, ehit)),
        s"$src: got ($nb,$nd,$tt,$td,$hit) expected ($enb,$end,$ett,$etd,$ehit)")
    }
  }

  test("q298: t-closeness matches a direct TVD recompute; gate consistent") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("lang"), floor(col("n_chars") / 500.0).cast("long"),
        col("source"))
      .as[(String, Long, String)].collect()
    val n = docs.length.toLong
    val glob = docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val out = SparkEntry.queries("q298_t_closeness")(spark, dir)
      .as[(String, Long, Long, Double, Boolean)].collect()
    assert(out.map(_._3).sum == n, "group sizes must partition the corpus")
    out.foreach { case (lang, band, ng, t, meets) =>
      val grp = docs.filter(d => d._1 == lang && d._2 == band)
      assert(grp.length.toLong == ng)
      // keys.toSeq: mapping over the key SET would dedupe equal
      // |num| contributions before the sum
      val sn = glob.keys.toSeq.map { s =>
        val c = grp.count(_._3 == s).toLong
        math.abs(c * n - glob(s) * ng)
      }.sum
      assert(t == round4(sn.toDouble / (2.0 * ng * n)), s"($lang,$band)")
      assert(meets == (sn * 10 <= ng * n * 6), s"gate ($lang,$band)")
      assert(t >= 0 && t <= 1)
    }
  }

  test("q299: W+ and z match a direct signed-rank recompute") {
    val daily = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")))
      .agg(
        sum(when(col("event_type") === "click",
          round(col("value") * 100).cast("long")).otherwise(0L)),
        sum(when(col("event_type") === "view",
          round(col("value") * 100).cast("long")).otherwise(0L)))
      .as[(java.sql.Date, Long, Long)].collect()
    val d = daily.map(r => r._2 - r._3).filter(_ != 0L)
    val sortedAbs = d.map(math.abs).sorted
    val rank = scala.collection.mutable.Map.empty[Long, Double]
    var i = 0
    var ties = 0.0
    while (i < sortedAbs.length) {
      var j = i
      while (j < sortedAbs.length && sortedAbs(j) == sortedAbs(i)) j += 1
      val t = (j - i).toDouble
      rank(sortedAbs(i)) = (i + 1 + j) / 2.0
      ties += t * t * t - t
      i = j
    }
    val w = d.filter(_ > 0).map(x => rank(math.abs(x))).sum
    val nn = d.length.toDouble
    val mu = nn * (nn + 1) / 4
    val vr = nn * (nn + 1) * (2 * nn + 1) / 24 - ties / 48
    val got = SparkEntry.queries("q299_wilcoxon_signed")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == daily.length && got._2 == d.length)
    assert(got._3 == round4(w), s"W+ ${got._3} vs $w")
    assert(math.abs(got._4 - (w - mu) / math.sqrt(vr)) < 1e-3)
  }

  test("q300: F matches a direct Brown-Forsythe recompute") {
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val zs = groups.map { case (et, xs) =>
      val s = xs.sorted
      val n = s.length
      val med2 = s((n + 1) / 2 - 1) + s(n / 2 + 1 - 1)
      et -> xs.map(x => math.abs(2 * x - med2).toDouble)
    }
    val k = zs.size
    val nN = rows.length
    val zAll = zs.values.flatten
    val gm = zAll.sum / nN
    val ssb = zs.values.map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    val ssw = zs.values.map(g => { val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum }).sum
    val f = (ssb / (k - 1)) / (ssw / (nN - k))
    val got = SparkEntry.queries("q300_levene_bf")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._1 == k && got._2 == nN)
    assert(got._3 == k - 1 && got._4 == nN - k)
    assert(math.abs(got._5 - f) < 1e-2, s"F ${got._5} vs $f")
  }

  test("q301: EWMA matches a direct 40-lag dyadic recompute") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(to_date(col("ts"))).count()
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.getTime)
    val dayMs = 86400000L
    def sFor(d: java.sql.Date): Long =
      daily.map { case (d2, x) =>
        val lag = (d.getTime - d2.getTime) / dayMs
        if (lag >= 0 && lag <= 39) x << (39 - lag).toInt else 0L
      }.sum
    val out = SparkEntry.queries("q301_ewma_chart")(spark, dir)
      .as[(java.sql.Date, Long, Double, Boolean)].collect()
    assert(out.length == daily.length)
    val byDay = daily.toMap
    out.zipWithIndex.foreach { case ((day, x, ewma, alert), idx) =>
      assert(x == byDay(day))
      val s = sFor(day)
      assert(ewma == round4(s.toDouble / math.pow(2, 40)), s"$day")
      if (idx == 0) assert(!alert)
      else {
        val sp = sFor(out(idx - 1)._1)
        assert(alert == (4 * math.abs(x * (1L << 40) - sp) > sp), s"$day")
      }
    }
  }
}
