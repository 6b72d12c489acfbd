package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q327 Chao1/Good-Turing, q328 skip-gram PMI, q329 decision stump. */
class RichnessStumpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q327: closed form on a planted frequency spectrum") {
    // lang X: tokens a a b b c  -> N=5 V=3 f1=1 (c) f2=2 (a,b)
    // chao1 = 3 + 1*0/(2*3) = 3; coverage = 1 - 1/5 = 0.8
    val tc = Seq(("X", "a", 2L), ("X", "b", 2L), ("X", "c", 1L))
      .toDF("lang", "term", "c")
    val out = tc.groupBy("lang").agg(
        sum("c").as("n_tokens"), count(lit(1)).as("v_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("v_types") +
        (col("f1") * (col("f1") - 1)).cast("double") /
          (lit(2) * (col("f2") + 1)).cast("double"),
        lit(1.0) - col("f1").cast("double") / col("n_tokens").cast("double"))
      .as[(Double, Double)].head()
    assert(out == ((3.0, 0.8)))
  }

  test("q327 gate frame: spectrum identities hold per language") {
    val out = SparkEntry.queries("q327_chao1_richness")(spark, dir)
      .select("n_tokens", "v_types", "f1", "f2", "chao1", "coverage")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, v, f1, f2, chao1, cov) =>
      assert(f1 + f2 <= v && v <= n)
      assert(chao1 >= v) // the estimator only adds unseen mass
      assert(cov >= 0.0 && cov <= 1.0)
    }
  }

  test("q328: pair extraction equals the hand count on one doc") {
    // "a b c d": window +-3 within 4 tokens -> all 6 unordered pairs.
    // "e e" -> one (e,e) pair.
    val docs = Seq((1L, "x", "y", Array("a", "b", "c", "d")),
        (2L, "x", "y", Array("e", "e")))
      .toDF("doc_id", "lang", "source", "a")
    val pairs = docs.filter(size(col("a")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(a) - 1),
          |  i -> transform(sequence(i + 1, least(i + 3, size(a))),
          |    j -> named_struct(
          |      'x', CASE WHEN element_at(a, i) <= element_at(a, j)
          |           THEN element_at(a, i) ELSE element_at(a, j) END,
          |      'y', CASE WHEN element_at(a, i) <= element_at(a, j)
          |           THEN element_at(a, j) ELSE element_at(a, i) END))))
          |""".stripMargin)).as("p"))
      .select("p.x", "p.y").as[(String, String)].collect().sorted
    assert(pairs.toSeq == Seq(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d"), ("e", "e")))
  }

  test("q328: window cap limits long docs to 3 partners per position") {
    val docs = Seq((1L, "x", "y", (1 to 10).map(i => f"w$i%02d").toArray))
      .toDF("doc_id", "lang", "source", "a")
    val n = docs.select(explode(expr(
        """flatten(transform(sequence(1, size(a) - 1),
          |  i -> transform(sequence(i + 1, least(i + 3, size(a))),
          |    j -> named_struct('x', element_at(a, i),
          |                      'y', element_at(a, j)))))""".stripMargin))
        .as("p")).count()
    // positions 1..7 contribute 3 pairs, 8 -> 2, 9 -> 1, 10 -> 0
    assert(n == 7 * 3 + 2 + 1)
  }

  test("q328 gate frame: canonical pairs, support floor, descending pmi") {
    val out = SparkEntry.queries("q328_skipgram_pmi")(spark, dir)
      .as[(String, String, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { case (x, y, c, _) => assert(x <= y && c >= 10) }
    assert(out.sliding(2).forall {
      case Array(a, b) => a._4 >= b._4; case _ => true
    })
  }

  test("q329: a perfectly separable feature reaches gini 0 at the cut") {
    val d = ((1 to 40).map(i => (i.toLong + 100, "en")) ++
      (1 to 40).map(i => (i.toLong + 400, "fr")))
      .toDF("n_chars", "lang")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("text", lit("t")).withColumn("source", lit("s"))
    d.createOrReplaceTempView("__stump_docs")
    // run the same logic inline on the planted frame
    val dd = d.select(col("n_chars"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val cands = dd.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
      .select(explode(sequence(lit(1), lit(15))).as("k"), col("mn"), col("mx"))
      .select(col("k"), (col("mn") + floor(
        (col("k") * (col("mx") - col("mn"))).cast("double") / 16))
        .cast("long").as("t"))
    val agg = dd.crossJoin(broadcast(cands)).groupBy("k", "t")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"),
        sum(when(col("n_chars") <= col("t"), 1L).otherwise(0L)).as("n_l"),
        sum(when(col("n_chars") <= col("t"), col("y")).otherwise(0L)).as("pos_l"))
      .withColumn("gini",
        (col("n_l") * col("n_l") - col("pos_l") * col("pos_l") -
          (col("n_l") - col("pos_l")) * (col("n_l") - col("pos_l")))
          .cast("double") / (col("n") * col("n_l")).cast("double") +
        ((col("n") - col("n_l")) * (col("n") - col("n_l")) -
          (col("pos") - col("pos_l")) * (col("pos") - col("pos_l")) -
          ((col("n") - col("n_l")) - (col("pos") - col("pos_l"))) *
          ((col("n") - col("n_l")) - (col("pos") - col("pos_l"))))
          .cast("double") /
          (col("n") * (col("n") - col("n_l"))).cast("double"))
    val rows = agg.filter(col("n_l") > 0 && col("n") > col("n_l"))
      .select("t", "gini").as[(Long, Double)].collect()
    // every threshold in the [140, 401) gap separates the classes exactly
    val mid = rows.filter(r => r._1 >= 140 && r._1 < 401)
    assert(mid.nonEmpty && mid.forall(_._2 == 0.0))
  }

  test("q329 gate frame: exactly >=1 best row, gini in [0, 0.5]") {
    val out = SparkEntry.queries("q329_stump_split")(spark, dir)
      .select("gini", "is_best").as[(Double, Int)].collect()
    assert(out.nonEmpty)
    assert(out.count(_._2 == 1) >= 1)
    val best = out.filter(_._2 == 1).map(_._1).min
    assert(out.forall(r => r._1 >= best))
    out.foreach { case (g, _) => assert(g >= 0.0 && g <= 0.5 + 1e-9) }
  }
}
