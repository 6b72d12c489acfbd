package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q360 Flesch panel, q361 Yule's K, q362 naive-Bayes langid. */
class TextModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q360: closed-form Flesch on a known sentence") {
    // "the cat sat on the mat." -> 6 words, 1 sentence, 6 vowel runs
    val words = 6.0; val sents = 1.0; val sylls = 6.0
    val f = 206.835 - 1.015 * words / sents - 84.6 * sylls / words
    assert(math.abs(f - (206.835 - 6.09 - 84.6)) < 1e-9)
    assert(f > 100) // trivially easy text scores above 100
  }

  test("q360 gate frame: ratios and hard-rate are internally consistent") {
    val rows = SparkEntry.queries("q360_flesch_panel")(spark, dir)
      .select("source", "n_docs", "mean_flesch", "words_per_sentence",
        "syllables_per_word", "hard_rate")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, _, wps, spw, hard) =>
      assert(n > 0)
      assert(wps >= 1.0) // words floored at 1 per sentence-run floor
      assert(spw >= 0.0)
      assert(hard >= 0.0 && hard <= 1.0)
    }
  }

  test("q361: Yule's K closed forms") {
    // all-distinct tokens: sum m^2 = N -> K = 0
    def k(spectrum: Map[Long, Long]): Double = {
      val n = spectrum.map { case (m, vm) => m * vm }.sum.toDouble
      val sm2 = spectrum.map { case (m, vm) => m * m * vm }.sum.toDouble
      1e4 * (sm2 - n) / (n * n)
    }
    assert(k(Map(1L -> 100L)) == 0.0)
    // one word repeated N times: K = 1e4 (N^2-N)/N^2 -> ~1e4
    assert(math.abs(k(Map(100L -> 1L)) - 1e4 * 99.0 / 100.0) < 1e-9)
    // repetition strictly increases K
    assert(k(Map(2L -> 50L)) > k(Map(1L -> 100L)))
  }

  test("q361 gate frame: vocab <= tokens and K >= 0") {
    val rows = SparkEntry.queries("q361_yule_k")(spark, dir)
      .select("lang", "n_tokens", "vocab", "yule_k")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq.sorted == Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { case (_, n, v, k) =>
      assert(v >= 1 && v <= n)
      assert(k >= 0.0 && k < 1e4)
    }
  }

  test("q362 gate frame: fold partition and accuracy consistency") {
    val rows = SparkEntry.queries("q362_nb_langid")(spark, dir)
      .select("lang", "n_test", "n_correct", "acc")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, a) =>
      assert(n > 0 && c >= 0 && c <= n)
      assert(math.abs(a - c.toDouble / n) < 1e-3)
    }
    // per-lang n_test must sum to the md5 %5 == 0 fold among docs
    // whose normalized text is long enough to trigram
    val docs = sources.Tables.documents(spark, dir)
      .withColumn("norm",
        regexp_replace(lower(col("text")), "\\s+", " "))
      .filter(length(col("norm")) >= 3)
    val testN = docs.filter(
      functions.TextFunctions.md5Int(
        concat(lit("nb:"), col("doc_id").cast("string")), 8)
        % 5 === 0).count()
    assert(rows.map(_._2).sum == testN)
  }
}
