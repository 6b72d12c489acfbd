package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q339 Hill tail index, q340 ROUGE-2 pair audit, q341 top paths. */
class TailPathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q339: exact Pareto data recovers its exponent") {
    // x_i = C * i^(-1/a) is an exact Pareto tail with alpha = a:
    // hill over top-k = mean(ln(x_i/x_{k+1}))^-1 -> a as k grows.
    val a = 2.5
    val xs = (1 to 500).map(i => (i.toLong, 1e6 * math.pow(i, -1.0 / a)))
      .toDF("o_orderkey", "o_totalprice")
    val k = 100
    val rn = xs.coalesce(1).withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
    val xref = rn.filter(col("rn") === k + 1)
      .select(col("o_totalprice").as("x_k1"))
    val alpha = rn.filter(col("rn") <= k).crossJoin(broadcast(xref))
      .agg((count(lit(1)).cast("double") /
        sum(log(col("o_totalprice") / col("x_k1")))).as("alpha"))
      .head().getDouble(0)
    // Hill on exact power-law ranks: ln(x_i/x_{k+1}) = (ln(k+1)-ln i)/a;
    // the deterministic estimate sits within a few percent of a
    assert(math.abs(alpha - a) / a < 0.05, s"alpha $alpha vs $a")
  }

  test("q339 gate frame: positive alpha, consistent inverse") {
    val out = SparkEntry.queries("q339_hill_tail")(spark, dir)
      .select("k", "x_k1", "sum_log", "hill_alpha")
      .as[(Long, Double, Double, Double)].head()
    val (k, xk1, slog, alpha) = out
    assert(k == 100 && xk1 > 0 && slog > 0)
    assert(math.abs(alpha - k / slog) < 1e-3)
  }

  test("q340: ROUGE identities on a hand pair") {
    // a: "w1 w2 w3 w4" (bigrams w1w2 w2w3 w3w4), b: "w2 w3 w4 w5"
    // -> overlap {w2w3, w3w4} = 2, p = r = 2/3, f = 2*2/(3+3) = 2/3
    val bi = Seq((1L, "w1 w2 w3 w4"), (2L, "w2 w3 w4 w5"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(1, size(t) - 1),
          |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))
          |""".stripMargin).as("b"))
    val r = bi.filter(col("doc_id") === 1L)
      .crossJoin(bi.filter(col("doc_id") === 2L)
        .select(col("b").as("b2")))
      .select(size(col("b")).as("na"), size(col("b2")).as("nb"),
        size(array_intersect(col("b"), col("b2"))).as("i"))
      .as[(Int, Int, Int)].head()
    assert(r == ((3, 3, 2)))
  }

  test("q340 gate frame: near-dup pairs score high ROUGE, metrics consistent") {
    val out = SparkEntry.queries("q340_rouge2_pairs")(spark, dir)
      .select("id_a", "id_b", "n_bi_a", "n_bi_b", "n_overlap",
        "rouge2_p", "rouge2_r", "rouge2_f")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, na, nb, i, p, r, f) =>
      assert(a < b && i <= math.min(na, nb))
      assert(p >= 0 && p <= 1 && r >= 0 && r <= 1)
      assert(f >= math.min(p, r) - 1e-9 && f <= math.max(p, r) + 1e-9)
      // J >= 0.7 on 3-shingles implies strong bigram overlap
      assert(f > 0.5, s"pair ($a,$b) f=$f unexpectedly low")
    }
  }

  test("q341: path pivot assembles prefixes in event order") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    // user 1 has 6 events (only first 4 kept); user 2 has 2
    val ev = Seq(
      (1L, ts(1), 1L, "a"), (2L, ts(2), 1L, "b"), (3L, ts(3), 1L, "c"),
      (4L, ts(4), 1L, "d"), (5L, ts(5), 1L, "e"), (6L, ts(6), 1L, "f"),
      (7L, ts(1), 2L, "x"), (8L, ts(2), 2L, "y"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val got = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type").as("t"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .groupBy("user_id")
      .agg(concat_ws(">",
        max(when(col("rn") === 1, col("t"))),
        max(when(col("rn") === 2, col("t"))),
        max(when(col("rn") === 3, col("t"))),
        max(when(col("rn") === 4, col("t")))).as("path"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "a>b>c>d" && got(2L) == "x>y")
  }

  test("q341 gate frame: counts cover all users, descending") {
    val out = SparkEntry.queries("q341_top_paths")(spark, dir)
      .as[(String, Long)].collect()
    assert(out.nonEmpty && out.length <= 15)
    assert(out.sliding(2).forall {
      case Array(x, y) => x._2 >= y._2; case _ => true
    })
    out.foreach { case (p, n) =>
      assert(n >= 1 && p.nonEmpty && p.split(">").length <= 4)
    }
  }
}
