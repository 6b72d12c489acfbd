package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q316 within-doc dedup + q317 langid confusion. */
class IntradocLangidSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q316 detector: planted within-doc repetition is found exactly") {
    // doc 1: a 10-token block repeated 3x + a unique tail block;
    // doc 2: 20 distinct tokens (no dups). Corpus-wide q297 would
    // also flag cross-doc copies; this must only see within-doc ones.
    val block = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "sA", s"$block $block $block tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8 tail9 tail10"),
      (2L, "sB", (1 to 20).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokens(lower(col("text"))).as("a"))
    val out = graft.operators.PipelineQueries.intradocDedupOf(docs)
      .select("source", "n_blocks", "n_dup", "toks_dropped", "n_docs_hit")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 1: 40 tokens -> 4 blocks, blocks 1 and 2 duplicate block 0
    assert(out(0) == (("sA", 4L, 2L, 20L, 1L)), s"got ${out(0)}")
    assert(out(1) == (("sB", 2L, 0L, 0L, 0L)), s"got ${out(1)}")
  }

  test("q316 gate frame: rates are consistent and bounded") {
    val out = SparkEntry.queries("q316_intradoc_dedup")(spark, dir)
      .select("n_blocks", "n_dup", "toks_total", "toks_dropped")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (nb, nd, tt, td) =>
      assert(nd <= nb && td <= tt && nd >= 0)
    }
  }

  test("q322: kappa matches a direct chance-corrected recompute") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("lang", "text").as[(String, String)].collect()
    val profiles = graft.functions.TextFunctions.langProfiles
    def pred(text: String): String = {
      val toks = text.trim.toLowerCase match {
        case "" => Array.empty[String]
        case s => s.split("\\s+")
      }
      profiles.toSeq
        .map { case (l, ws) => (-toks.count(ws.contains), l) }
        .min._2
    }
    val pairs = docs.map(d => (d._1, pred(d._2)))
    val n = pairs.length.toLong
    val agree = pairs.count(p => p._1 == p._2).toLong
    val labels = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val src = labels.map { l =>
      pairs.count(_._1 == l).toLong * pairs.count(_._2 == l)
    }.sum
    val kappa = (n * agree - src).toDouble / (n * n - src)
    val round4 = (x: Double) => math.floor(x * 1e4 + 0.5) / 1e4
    val got = SparkEntry.queries("q322_cohens_kappa")(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == n && got._2 == agree)
    assert(got._5 == round4(kappa), s"kappa ${got._5} vs $kappa")
    assert(got._5 >= -1.0 && got._5 <= 1.0)
  }

  test("q317: confusion matrix matches a direct recompute; rows partition labels") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("lang", "text").as[(String, String)].collect()
    val profiles = graft.functions.TextFunctions.langProfiles
    def pred(text: String): String = {
      val toks = text.trim.toLowerCase match {
        case "" => Array.empty[String]
        case s => s.split("\\s+")
      }
      profiles.toSeq
        .map { case (l, ws) => (-toks.count(ws.contains), l) }
        .min._2
    }
    val expect = docs.groupBy(d => (d._1, pred(d._2))).view
      .mapValues(_.length.toLong).toMap
    val out = SparkEntry.queries("q317_langid_confusion")(spark, dir)
      .select("lang", "lang_pred", "n", "label_total")
      .as[(String, String, Long, Long)].collect()
    assert(out.map(_._3).sum == docs.length, "cells partition the corpus")
    out.foreach { case (l, p, n, lt) =>
      assert(n == expect((l, p)), s"cell ($l,$p)")
      assert(lt == docs.count(_._1 == l))
    }
    assert(out.map(r => (r._1, r._2)).toSet == expect.keySet)
  }
}
