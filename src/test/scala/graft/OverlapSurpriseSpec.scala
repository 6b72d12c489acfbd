package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q333 vocab overlap, q334 Wasserstein-1, q335 Markov surprise. */
class OverlapSurpriseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q333 gate frame: Jaccard identities and bounds") {
    val out = SparkEntry.queries("q333_lang_overlap")(spark, dir)
      .select("la", "lb", "sa", "sb", "n_inter", "n_union", "jaccard")
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(out.length == 10) // C(5,2) language pairs
    out.foreach { case (la, lb, sa, sb, ni, nu, j) =>
      assert(la < lb)
      assert(ni <= math.min(sa, sb) && nu >= math.max(sa, sb))
      assert(nu == sa + sb - ni)
      assert(j >= 0.0 && j <= 1.0)
    }
    // the synthetic corpus shares its content vocabulary across
    // languages (same generator word pool), so overlap must be high
    // for at least one pair — this guards against an accidental
    // per-doc (rather than per-lang) set build
    assert(out.map(_._7).max > 0.3)
  }

  test("q334: W1 closed form on two hand point-masses") {
    // lang A: all 10 docs at length 100; lang B: all 10 at length 250
    // -> W1 = |100 - 250| = 150 exactly
    val counts = Seq(("A", 100L, 10L), ("B", 250L, 10L))
      .toDF("lang", "v", "c")
    val vals = counts.select("v").distinct()
    val langs = counts.select("lang").distinct()
    val W = org.apache.spark.sql.expressions.Window
    val grid = vals.crossJoin(langs)
      .join(counts, Seq("lang", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum(col("c")).over(W.partitionBy("lang")
        .orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("gap", coalesce(lead(col("v"), 1).over(
        W.partitionBy("lang").orderBy("v")) - col("v"), lit(0L)))
    val totals = grid.groupBy("lang").agg(max("cum").as("n"))
    val a = grid.join(totals, Seq("lang"))
      .select(col("lang").as("la"), col("v"), col("cum").as("ca"),
        col("n").as("na"), col("gap"))
    val b = grid.join(totals, Seq("lang"))
      .select(col("lang").as("lb"), col("v"), col("cum").as("cb"),
        col("n").as("nb"))
    val w1 = a.join(b, Seq("v")).filter(col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg((sum(abs(col("ca") * col("nb") - col("cb") * col("na")) *
        col("gap")).cast("double") /
        (max("na") * max("nb")).cast("double")).as("w1"))
      .as[(String, String, Double)].head()
    assert(w1 == (("A", "B", 150.0)))
  }

  test("q334 gate frame: symmetric-positive, bounded by the value range") {
    val out = SparkEntry.queries("q334_wasserstein")(spark, dir)
      .select("la", "lb", "n_a", "n_b", "w1_chars")
      .as[(String, String, Long, Long, Double)].collect()
    assert(out.length == 10)
    val range = graft.sources.Tables.documents(spark, dir)
      .agg(max("n_chars") - min("n_chars")).head().getLong(0)
    out.foreach { case (la, lb, na, nb, w1) =>
      assert(la < lb && na > 0 && nb > 0)
      assert(w1 >= 0.0 && w1 <= range.toDouble)
    }
  }

  test("q335: a user repeating the globally-common transition scores low") {
    // Global chain dominated by a->a; user 99 walks rare b->c edges.
    // With Laplace smoothing, surprise(99) > surprise(1).
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val ev = ((1 to 50).map(i => (i.toLong, ts(i), 1L, "a", 1.0, "")) ++
      Seq((101L, ts(1), 99L, "b", 1.0, ""), (102L, ts(2), 99L, "c", 1.0, ""),
        (103L, ts(3), 99L, "b", 1.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val trans = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type").as("t"))
      .withColumn("prev", lag(col("t"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), col("prev"), col("t"))
    val k = trans.select(col("t")).unionAll(trans.select(col("prev")))
      .distinct().agg(count(lit(1)).as("kk"))
    val model = trans.groupBy("prev", "t").agg(count(lit(1)).as("c_ij"))
      .join(trans.groupBy("prev").agg(count(lit(1)).as("c_i")), Seq("prev"))
      .crossJoin(broadcast(k))
    val scored = trans.join(broadcast(model), Seq("prev", "t"))
      .withColumn("nll", -log((col("c_ij") + 1).cast("double") /
        (col("c_i") + col("kk")).cast("double")))
      .groupBy("user_id").agg((sum("nll") / count(lit(1))).as("surprise"))
      .as[(Long, Double)].collect().toMap
    assert(scored(99L) > scored(1L))
  }

  test("q335 gate frame: descending, positive, bounded transitions") {
    val out = SparkEntry.queries("q335_markov_surprise")(spark, dir)
      .select("user_id", "n_trans", "surprise")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.sliding(2).forall {
      case Array(x, y) => x._3 >= y._3; case _ => true
    })
    out.foreach { case (_, n, sp) => assert(n >= 1 && sp > 0.0) }
  }
}
