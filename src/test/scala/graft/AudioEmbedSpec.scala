package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Audio envelope fingerprint (q262) and embedding silhouette (q263).
  * Value truth is the DuckDB oracle; these pin the dedup semantics
  * (re-wrapped copies collide, container bytes differ) and the
  * silhouette bounds. */
class AudioEmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q262: re-wrapped copies share the fingerprint while their bytes differ") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id").as[Long].collect()
    val planted = docs.filter(_ % 13 == 0).map(d => (d * 2, d * 2 + 1)).toSet
    val out = SparkEntry.queries("q262_audio_fingerprint")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == planted,
      s"at this sf the dup pairs must be exactly the planted copies; " +
        s"missing=${planted -- out} extra=${out -- planted}")
    // the two containers really are different byte streams
    val d0 = docs.filter(_ % 13 == 0).head
    val digests = Seq((d0, 16000), (d0, 44100)).toDF("doc_id", "rate")
      .select(md5(graft.operators.Multimodal.wavBytesPcm(col("rate"),
        lit(1), lit(512), col("doc_id")))).as[String].collect()
    assert(digests.distinct.length == 2,
      "planted copy must differ in container bytes (or the dedup is trivial)")
  }

  test("q262: fingerprint is a 30-bit value derived from decoded PCM") {
    val fps = SparkEntry.queries("q262_audio_fingerprint")(spark, dir)
      .select("fp").as[Long].collect()
    fps.foreach(f => assert(f >= 0 && f < (1L << 30)))
  }

  test("q265: two-NN estimator recovers dimension 1 on a synthetic line (formula check)") {
    // deterministic UNIFORM pseudo-random 1-D point set (a jittered
    // grid is too regular — near-constant spacing inflates the
    // estimate); the MLE n/sum(ln d2/d1) must land near 1
    // (Facco et al.: ln mu ~ Exp(id) in expectation)
    val pts = (0 until 300)
      .map(i => ((i * 2654435761L) % 1000000L) / 1000.0)
      .distinct.sorted
    val mus = pts.indices.map { i =>
      val ds = pts.indices.filter(_ != i)
        .map(j => math.abs(pts(j) - pts(i))).sorted
      ds(1) / ds(0)
    }
    val id = mus.length / mus.map(math.log).sum
    assert(id > 0.5 && id < 2.0, s"1-D estimate off: $id")
  }

  test("q265: sample size, mu ordering, positive finite estimate") {
    val (n, idHat, p50, p90) =
      SparkEntry.queries("q265_twonn_dim")(spark, dir)
        .as[(Long, Double, Double, Double)].collect().head
    val expectN = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 7 === 0).count()
    assert(n == expectN)
    assert(p50 >= 1.0 && p90 >= p50, "d2/d1 ratios are >= 1 and ordered")
    assert(idHat > 0 && !idHat.isInfinite)
  }

  test("q266: vectors conserved, rate consistent with counts") {
    val rows = SparkEntry.queries("q266_label_noise")(spark, dir)
      .select("n_vecs", "n_suspect", "noise_rate")
      .as[(Long, Long, Double)].collect()
    val total = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.map(_._1).sum == total)
    assert(rows.map(_._2).sum < total,
      "some points must sit nearest their own centroid")
    rows.foreach { case (n, k, r) =>
      assert(k <= n)
      assert(math.abs(r - BigDecimal(k.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q271: MRR/recall bounds and query-sample size") {
    val (n, mrr, r5) = SparkEntry.queries("q271_retrieval_mrr")(spark, dir)
      .as[(Long, Double, Double)].collect().head
    val expectN = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 9 === 0).count()
    assert(n == expectN)
    assert(mrr >= 0 && mrr <= 1 && r5 >= 0 && r5 <= 1)
    // with 10 labels a random ranker's MRR is well below a perfect 1;
    // label signal or not, the metric must be strictly positive here
    // (every query has same-label candidates in this corpus)
    assert(mrr > 0)
  }

  test("q263: silhouette bounded, labels covered, vectors conserved") {
    val rows = SparkEntry.queries("q263_embed_silhouette")(spark, dir)
      .select("label", "n_vecs", "avg_a", "avg_b", "silhouette")
      .as[(Int, Long, Double, Double, Double)].collect()
    val total = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (_, _, a, b, sil) =>
      assert(a > 0 && b > 0)
      assert(sil >= -1.0 - 1e-9 && sil <= 1.0 + 1e-9)
    }
  }
}
