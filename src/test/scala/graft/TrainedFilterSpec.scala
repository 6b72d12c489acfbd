package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainedFilter

/** In-engine trained logistic quality filter: separable-corpus
  * convergence, gradient direction, bias-only scoring for token-less
  * docs, and the weights-table shape. */
class TrainedFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fit(texts: Seq[(Long, String, Long)], buckets: Int = 32,
      iters: Int = 3) = {
    val docs = texts.toDF("doc_id", "text", "y")
    val labels = docs.select(col("doc_id"), col("y"))
    val arrs = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(lower(col("text"))).as("a"))
    val feats = TrainedFilter.hashedFeatures(arrs, buckets)
    val (wu, bu) = TrainedFilter.trainLogistic(labels, feats, buckets,
      iters, lr = 0.5, nDocs = texts.size.toLong)
    (labels, feats, wu, bu)
  }

  test("separable corpus: every prediction matches its label after 3 rounds") {
    val texts = (0L until 10L).map(i => (i, "alpha beta", 1L)) ++
      (10L until 20L).map(i => (i, "gamma delta", 0L))
    val (labels, feats, wu, bu) = fit(texts)
    val got = TrainedFilter.scoreLogistic(labels, feats, wu, bu)
      .select("doc_id", "label", "score", "pred")
      .as[(Long, Long, Double, Int)].collect()
    assert(got.length == 20)
    got.foreach { case (id, y, p, pred) =>
      assert(pred == y, s"doc $id: pred $pred != label $y (p=$p)") }
    // scores actually separate, not boundary-hugging
    val (pos, neg) = got.partition(_._2 == 1L)
    assert(pos.map(_._3).min > neg.map(_._3).max + 0.1)
  }

  test("gradient direction: a positive-only token's bucket gains weight; balanced corpus keeps bias 0") {
    val texts = (0L until 10L).map(i => (i, "alpha beta", 1L)) ++
      (10L until 20L).map(i => (i, "gamma delta", 0L))
    val (_, feats, wu, bu) = fit(texts)
    // hand-checked round 1: e = ∓500000, Δw = ±roundL(0.5·5e6/20)
    val posBuckets = feats.filter(col("doc_id") === 0L)
      .select("j").as[Int].collect().toSet
    val negBuckets = feats.filter(col("doc_id") === 10L)
      .select("j").as[Int].collect().toSet
    assume((posBuckets & negBuckets).isEmpty, "bucket collision — change tokens")
    posBuckets.foreach(j => assert(wu(j) > 0, s"pos bucket $j: ${wu(j)}"))
    negBuckets.foreach(j => assert(wu(j) < 0, s"neg bucket $j: ${wu(j)}"))
    assert(bu == 0L, s"balanced labels must leave bias at 0, got $bu")
  }

  test("token-less docs train and score through the bias alone") {
    // 3:1 positive empty docs — no features anywhere, so the model can
    // only move its bias, and must move it positive
    val texts = Seq((0L, "", 1L), (1L, "", 1L), (2L, "", 1L), (3L, "", 0L))
    val (labels, feats, wu, bu) = fit(texts)
    assert(feats.count() == 0)
    assert(wu.forall(_ == 0L), "no features ⇒ no bucket weight may move")
    assert(bu > 0L, s"3:1 positive corpus must push bias up, got $bu")
    val scores = TrainedFilter.scoreLogistic(labels, feats, wu, bu)
      .select("score").as[Double].collect().distinct
    assert(scores.length == 1 && scores.head > 0.5,
      s"every doc scores sigmoid(bias): $scores")
  }

  test("weightsTable: B+1 rows, bias at j=-1, real-scale values") {
    val wu = Array(125000L, -250000L)
    val got = TrainedFilter.weightsTable(spark, wu, 500000L)
      .orderBy("j").as[(Int, Double)].collect()
    assert(got.toSeq == Seq((-1, 0.5), (0, 0.125), (1, -0.25)))
  }
}
