package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 second wave: blocked Jaro–Winkler record linkage (q250)
  * and the inference-statistics panel (q251–q257). Value truth is the
  * DuckDB oracle; these tests pin the scorer's semantics and the
  * invariants the oracle compare can't see. */
class LinkageStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  // ---- the native Jaro–Winkler scorer ----

  test("graft_jaro_winkler: classic reference values, byte-level unicode, null/empty") {
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(call_function("graft_jaro_winkler", col("a"), col("b")))
        .as[Double].collect().head
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    // boost threshold: jaro = 2/3 <= 0.7, so the 4-byte common prefix
    // must NOT earn the Winkler bonus
    assert(math.abs(jw("abcdefgh", "abcdwxyz") - 0.6666666666666666) < 1e-12)
    // byte-level: é is two UTF-8 bytes, so héllo vs hélla is a
    // 6-byte comparison with a 4-byte prefix (matches the oracle
    // engine's byte-level function)
    assert(math.abs(jw("hélla", "héllo") - 0.9333333333333333) < 1e-12)
    val n = Seq((Option.empty[String], Option("x"))).toDF("a", "b")
      .select(call_function("graft_jaro_winkler", col("a"), col("b")))
      .as[Option[Double]].collect().head
    assert(n.isEmpty, "null input must yield null, not a score")
  }

  test("q250: pairs stay inside their block, scores clear the threshold, ranks are per-brand") {
    val parts = graft.sources.Tables.part(spark, dir)
    val pairs = graft.operators.CorpusOps.linkagePairs(
      parts, "p_name", Seq("p_brand", "p_size"), minSim = 0.8)
    val byName = parts.select(col("p_name").as("name_a"),
        col("p_brand"), col("p_size")).distinct()
    // joining each pair's name_a back to its (brand,size) and then to
    // name_b must reproduce the pair — i.e. both names share the block
    val chk = pairs.join(byName, Seq("name_a", "p_brand", "p_size"))
    assert(chk.count() == pairs.count(), "every pair must share its block")
    assert(pairs.filter(col("jw") < 0.8).count() == 0)
    assert(pairs.filter(col("name_a") >= col("name_b")).count() == 0)
    val out = SparkEntry.queries("q250_record_linkage")(spark, dir)
      .select("brand", "rnk").as[(String, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        "ranks within a brand must be 1..k")
    }
  }

  // ---- the statistics panel ----

  test("q251: Spearman is 1.0 on a monotone pair and bounded on real data") {
    // hand check of the fractional-rank construction on a frame with ties
    val xs = Seq(1.0, 2.0, 2.0, 3.0)
    val ranks = xs.map(v =>
      xs.count(_ < v) + 1 + (xs.count(_ == v) - 1) / 2.0)
    assert(ranks == Seq(1.0, 2.5, 2.5, 4.0))
    val (n, rho, pearson) =
      SparkEntry.queries("q251_spearman")(spark, dir)
        .as[(Long, Double, Double)].collect().head
    assert(n > 0 && math.abs(rho) <= 1.0 && math.abs(pearson) <= 1.0)
  }

  test("q252: sign counts partition the pairs and tau_b is bounded") {
    val (nPairs, c, d, t, tau) =
      SparkEntry.queries("q252_kendall_tau")(spark, dir)
        .as[(Long, Long, Long, Long, Double)].collect().head
    assert(c + d + t == nPairs, "concordant+discordant+ties must cover all pairs")
    assert(math.abs(tau) <= 1.0)
    // tau-b definition check on the emitted counts
    assert(math.abs(tau - BigDecimal((c - d).toDouble /
      math.sqrt((nPairs - t).toDouble * nPairs))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q253: t sign follows the mean gap; Welch df is positive and below pooled df") {
    val rows = SparkEntry.queries("q253_welch_ttest")(spark, dir)
      .select("n_docs", "mean_src", "mean_rest", "t_stat", "df_welch")
      .as[(Long, Double, Double, Double, Double)].collect()
    val nTotal = rows.map(_._1).sum
    rows.foreach { case (_, mSrc, mRest, t, df) =>
      assert(math.signum(t) == math.signum(mSrc - mRest) || t == 0.0)
      assert(df > 0 && df <= nTotal - 2,
        s"Welch df must sit in (0, n-2], got $df")
    }
  }

  test("q254: ANOVA identity SSB+SSW=SST and dfs add up") {
    val (k, n, df1, df2, f, eta) =
      SparkEntry.queries("q254_anova_f")(spark, dir)
        .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(df1 == k - 1 && df2 == n - k)
    assert(f >= 0 && eta >= 0 && eta <= 1)
    // cross-check F against a direct two-pass computation
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("n_chars").cast("double").as("x"),
        col("source"))
    val xs = docs.as[(Double, String)].collect()
    val grand = xs.map(_._1).sum / xs.length
    val groups = xs.groupBy(_._2).values
    val ssb = groups.map(g =>
      g.length * math.pow(g.map(_._1).sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.map(_._1).sum / g.length
      g.map(v => math.pow(v._1 - m, 2)).sum
    }).sum
    val fRef = (ssb / df1) / (ssw / df2)
    assert(math.abs(f - fRef) < 1e-3, s"F mismatch: $f vs $fRef")
  }

  test("q255: lag grid is -7..7, ccf bounded, lag-0 day count maximal among lags") {
    val rows = SparkEntry.queries("q255_ccf_daily")(spark, dir)
      .select("lag", "n_days", "ccf").as[(Int, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == (-7 to 7).toSeq)
    rows.foreach { case (_, n, c) =>
      assert(n > 0 && math.abs(c) <= 1.0)
    }
    val n0 = rows.find(_._1 == 0).get._2
    assert(rows.forall(_._2 <= n0),
      "no lag can overlap more days than lag 0 on a contiguous range")
  }

  test("q256: diversity identities — eff = exp(H), Simpson bounds, shares sum to 1") {
    val rows = SparkEntry.queries("q256_diversity")(spark, dir)
      .select("n_langs", "shannon", "simpson", "eff_langs")
      .as[(Long, Double, Double, Double)].collect()
    rows.foreach { case (k, h, simp, eff) =>
      assert(h >= 0 && h <= math.log(k.toDouble) + 1e-4)
      assert(simp >= 1.0 / k - 1e-4 && simp <= 1.0 + 1e-9)
      assert(math.abs(eff - math.exp(h)) < 2e-3,
        "effective languages must be exp(shannon) up to 4-dp rounding")
    }
  }

  test("q257: leave-one-out means move opposite the removed source; jk_se constant") {
    val rows = SparkEntry.queries("q257_jackknife_mean")(spark, dir)
      .select("n_docs", "loo_mean", "full_mean", "jk_se")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.map(_._4).distinct.length == 1, "jk_se is a corpus constant")
    val docs = graft.sources.Tables.documents(spark, dir)
    val bySrc = docs.groupBy("source")
      .agg(avg(col("n_chars")).as("m")).as[(String, Double)].collect().toMap
    val srcRows = SparkEntry.queries("q257_jackknife_mean")(spark, dir)
      .select("source", "loo_mean", "full_mean")
      .as[(String, Double, Double)].collect()
    srcRows.foreach { case (src, loo, full) =>
      // removing an above-average source lowers the mean and vice versa
      if (bySrc(src) > full + 1e-6) assert(loo <= full + 1e-4)
      if (bySrc(src) < full - 1e-6) assert(loo >= full - 1e-4)
    }
  }
}
