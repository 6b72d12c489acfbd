package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 statistics/quality wave: histogram mutual information
  * (q246), two-window mean-shift detection (q247), Theil–Sen robust
  * trend (q248), and the native deflate-length compression-ratio
  * signal (q249). Value truth for q246–q248 is the DuckDB oracle; the
  * tests here pin the invariants the oracle compare can't see. */
class StatsWaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  // ---- q246 mutual information ----

  test("q246: MI is non-negative, cells cover the corpus, PMI/contrib signs agree") {
    val out = SparkEntry.queries("q246_mutual_info")(spark, dir)
      .select("n_xy", "pmi", "contrib", "mi_total")
      .as[(Long, Double, Double, Double)].collect()
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    assert(out.map(_._1).sum == nDocs, "joint histogram must cover every doc")
    // rounding each contrib to 4dp can shave at most 5e-5 per cell
    assert(out.head._4 >= -5e-5 * out.length, s"MI must be >= 0, got ${out.head._4}")
    out.foreach { case (_, pmi, contrib, _) =>
      assert(pmi * contrib >= 0 || contrib == 0.0 || pmi == 0.0,
        s"contrib is pmi scaled by a positive mass: signs must agree ($pmi, $contrib)")
    }
  }

  test("q246: MI of an independent pair is ~0 (analytic cross-check)") {
    // lang × (doc_id parity) is independent by construction of the
    // synthetic generator only if parity carries no signal; instead
    // verify the IDENTITY case: MI(x, x) equals the entropy of x.
    val docs = graft.sources.Tables.documents(spark, dir)
    val n = docs.count().toDouble
    val h = docs.groupBy("lang").count().as[(String, Long)].collect()
      .map { case (_, c) => -(c / n) * math.log(c / n) }.sum
    val cells = docs.groupBy("lang").count()
      .select((col("count") / n * log(lit(n) / col("count"))).as("c"))
      .as[Double].collect().sum
    assert(math.abs(cells - h) < 1e-9)
  }

  // ---- q247 mean shift ----

  test("q247: shift column is post-pre at 4dp, windows are full, days ordered") {
    val rows = SparkEntry.queries("q247_mean_shift")(spark, dir)
      .select("day", "pre", "post", "shift")
      .as[(java.sql.Date, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, pre, post, shift) =>
      assert(math.abs(shift - BigDecimal(post - pre)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    assert(rows.map(_._1.toLocalDate).sliding(2).forall(p =>
      p.length < 2 || p(0).isBefore(p(1))))
  }

  test("q247: a planted level shift is flagged, a flat series is not") {
    // direct two-window check on a hand frame mirroring the operator's
    // rule: |post-pre| > 0.25*pre
    val flat = (1 to 30).map(_ => 100.0)
    val shifted = (1 to 15).map(_ => 100.0) ++ (1 to 15).map(_ => 200.0)
    def flags(xs: Seq[Double]): Seq[Boolean] = {
      val idx = xs.indices
      idx.flatMap { i =>
        val pre = idx.filter(j => j >= i - 7 && j <= i - 1).map(xs)
        val post = idx.filter(j => j >= i && j <= i + 6).map(xs)
        if (pre.length == 7 && post.length == 7)
          Some(math.abs(post.sum / 7 - pre.sum / 7) > 0.25 * (pre.sum / 7))
        else None
      }
    }
    assert(!flags(flat).exists(identity))
    assert(flags(shifted).exists(identity))
  }

  // ---- q248 Theil–Sen ----

  test("q248: pair count is n(n-1)/2 and the fit is finite") {
    val (nDays, nPairs, slope, intercept) =
      SparkEntry.queries("q248_theil_sen")(spark, dir)
        .as[(Long, Long, Double, Double)].collect().head
    assert(nPairs == nDays * (nDays - 1) / 2)
    assert(!slope.isNaN && !intercept.isNaN)
  }

  test("q248: Theil-Sen recovers a planted linear trend exactly, ignoring one outlier") {
    // median-of-slopes on y = 3x + 7 with one wrecked point: the
    // outlier contributes n-1 of n(n-1)/2 slopes — median unmoved
    val pts = (0 until 20).map(i => (i.toDouble, 3.0 * i + 7.0))
      .updated(10, (10.0, 1e6))
    val slopes = for {
      (a, i) <- pts.zipWithIndex; (b, j) <- pts.zipWithIndex if i < j
    } yield (b._2 - a._2) / (b._1 - a._1)
    val sorted = slopes.sorted
    val med =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2
    assert(math.abs(med - 3.0) < 1e-9)
  }

  // ---- q249 deflate-length quality signal ----

  test("graft_deflate_len: deterministic, matches a reference Deflater, null-safe") {
    val df = Seq(
      Some("spam spam spam spam spam spam spam spam"),
      Some("The five boxing wizards jump quickly."),
      None).toDF("t")
      .select(call_function("graft_deflate_len", col("t")).as("n"))
    val got = df.as[Option[Int]].collect()
    def ref(s: String): Int = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    assert(got(0).contains(ref("spam spam spam spam spam spam spam spam")))
    assert(got(1).contains(ref("The five boxing wizards jump quickly.")))
    assert(got(2).isEmpty)
  }

  test("graft_deflate_len: repetition compresses below prose; ratio signal orders as published") {
    val rep = "lorem ipsum " * 200
    val prose = (1 to 50).map(i =>
      s"sentence $i carries varied content token${i * 7 % 13}").mkString(". ")
    val Seq(rRep, rProse) = Seq(rep, prose).map { t =>
      val n = Seq(t).toDF("t")
        .select(call_function("graft_deflate_len", col("t")).as("n"))
        .as[Int].collect().head
      n.toDouble / t.getBytes("UTF-8").length
    }
    assert(rRep < rProse,
      s"boilerplate must compress below prose ($rRep vs $rProse)")
    assert(rRep < 0.1 && rProse > 0.1)
  }

  test("q249: deciles partition the corpus, counts sum to corpus size") {
    val out = SparkEntry.queries("q249_compressibility")(spark, dir)
      .select("ratio_decile", "n_docs").as[(Int, Long)].collect()
    assert(out.map(_._1).forall(d => d >= 0 && d <= 9))
    assert(out.map(_._2).sum ==
      graft.sources.Tables.documents(spark, dir)
        .filter(length(col("text")) >= 3).count())
  }

  test("deflate-ratio variant (spec-gated): deciles partition, counts sum") {
    // graft_deflate_len has no DuckDB-statable oracle, so this query
    // lives outside the gate registry; its engine surface stays
    // exercised here (plus the Deflater-parity tests above).
    val out = graft.operators.PipelineQueries.compressRatio(spark, dir)
      .select("ratio_decile", "n_docs").as[(Int, Long)].collect()
    assert(out.map(_._1).forall(d => d >= 0 && d <= 9))
    assert(out.map(_._2).sum ==
      graft.sources.Tables.documents(spark, dir).count())
  }
}
