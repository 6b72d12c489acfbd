package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.BandJoinRewrite]]: plain-syntax band joins re-plan
  * through the native [[graft.plans.BandJoinExec]]; everything outside
  * the exec's contract is left untouched. */
class BandRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // string probe: BandJoinExec sits inside AQE's AdaptiveSparkPlan
  // wrapper, which plan.collect does not descend into
  private def hasBandExec(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("BandJoin")

  // adversarial band data: duplicate times, exact-edge gaps, a key
  // only on one side, NULL keys and times on both sides
  private lazy val left = Seq[(java.lang.Long, java.lang.Long, String)](
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "b2"), (2L, 5L, "c"),
    (3L, 100L, "d"), (null, 10L, "n1"), (1L, null, "n2"))
    .toDF("k", "t", "tag")
  private lazy val right = Seq[(java.lang.Long, java.lang.Long, String)](
    (1L, 13L, "x"), (1L, 17L, "y"), (1L, 23L, "z"), (2L, 1L, "w"),
    (9L, 5L, "only"), (null, 13L, "m1"), (2L, null, "m2"))
    .toDF("k2", "t2", "tag2")

  test("plain-syntax inner band join re-plans through BandJoinExec, rows match the composition") {
    val naive = left.join(right,
      col("k") === col("k2") && abs(col("t") - col("t2")) <= lit(3L))
    assert(hasBandExec(naive), naive.queryExecution.executedPlan.toString)
    val got = naive.select("tag", "tag2").as[(String, String)]
      .collect().toSet
    // the composition operator is the row-identity reference
    val comp = graft.operators.RangeJoin.bandedRangeJoin(
        left.na.drop(Seq("k", "t")),
        right.na.drop(Seq("k2", "t2"))
          .select(col("k2").as("k"), col("t2"), col("tag2")),
        Seq("k"), "t", "t2", maxGap = 3L)
      .select(col("tag"), col("match.tag2").as("tag2"))
      .as[(String, String)].collect().toSet
    assert(got == comp, s"got $got vs composition $comp")
    assert(got == Set(("a", "x"), ("b", "y"), ("b", "z"),
      ("b2", "y"), ("b2", "z")))
  }

  test("extra conjuncts survive as a filter on top of the native node") {
    val df = left.join(right,
      col("k") === col("k2") && abs(col("t") - col("t2")) <= lit(3L) &&
        col("tag") =!= col("tag2"))
    assert(hasBandExec(df), df.queryExecution.executedPlan.toString)
    // same pairs as above — tag never equals tag2 in the fixture
    assert(df.count() == 5)
    val strict = left.join(right,
      col("k") === col("k2") && abs(col("t") - col("t2")) <= lit(3L) &&
        col("tag2") === "x")
    assert(hasBandExec(strict))
    assert(strict.select("tag").as[String].collect().toSet == Set("a"))
  }

  test("reversed operand orders still match") {
    val df = left.join(right,
      col("k2") === col("k") && abs(col("t2") - col("t")) <= lit(3L))
    assert(hasBandExec(df))
    assert(df.count() == 5)
  }

  test("non-matching shapes are left untouched") {
    // outer join
    assert(!hasBandExec(left.join(right,
      col("k") === col("k2") && abs(col("t") - col("t2")) <= lit(3L),
      "left_outer")))
    // non-literal gap
    assert(!hasBandExec(left.join(right,
      col("k") === col("k2") && abs(col("t") - col("t2")) <= col("t2"))))
    // non-long band operands
    val dleft = left.select(col("k"), col("t").cast("double").as("td"))
    val dright = right.select(col("k2"), col("t2").cast("double").as("td2"))
    assert(!hasBandExec(dleft.join(dright,
      col("k") === col("k2") && abs(col("td") - col("td2")) <= lit(3.0))))
    // no equality conjunct at all
    assert(!hasBandExec(left.join(right,
      abs(col("t") - col("t2")) <= lit(3L))))
    // composite-key equality (two cross-side long equalities): left
    // alone — the engine's own explode-composition joins on
    // (key, bucket) and must keep its hash plan
    assert(!hasBandExec(left.join(right,
      col("k") === col("k2") && col("t") === col("t2") &&
        abs(col("t") - col("t2")) <= lit(3L))))
  }

  test("seeded randomized parity: rewritten plan equals brute-force cross+filter") {
    // deterministic md5-derived data: dense key collisions (keys 0-4),
    // clustered times (0-49), gaps that land exactly on |Δt| == gap
    val rnd = new scala.util.Random(4212L)
    val l2 = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r2 = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k2", "t2", "rid")
    for (gap <- Seq(1L, 4L, 13L)) {
      val naive = l2.join(r2,
        col("k") === col("k2") && abs(col("t") - col("t2")) <= lit(gap))
      assert(hasBandExec(naive), s"gap=$gap must rewrite")
      val got = naive.select("lid", "rid").as[(Long, Long)].collect().toSet
      // ground truth computed OUTSIDE Spark entirely (a filter-based
      // reference plan would itself be rewritten after pushdown)
      val lrows = l2.as[(Long, Long, Long)].collect()
      val rrows = r2.as[(Long, Long, Long)].collect()
      val truth = (for {
        (lk, lt, lid) <- lrows
        (rk, rt, rid) <- rrows
        if lk == rk && math.abs(lt - rt) <= gap
      } yield (lid, rid)).toSet
      assert(got == truth,
        s"gap=$gap: ${got.size} vs ${truth.size} pairs")
    }
  }

  test("the q440 gate query itself plans through BandJoinExec") {
    val df = SparkEntry.queries("q440_band_rewrite")(
      spark, "/root/testdata/sf0.001")
    assert(hasBandExec(df), df.queryExecution.executedPlan.toString)
    assert(df.count() > 0)
  }

  test("the q444 left-outer gate twin does NOT plan through BandJoinExec") {
    val df = SparkEntry.queries("q444_band_left_outer")(
      spark, "/root/testdata/sf0.001")
    assert(!hasBandExec(df), df.queryExecution.executedPlan.toString)
    // outer semantics intact: at least one unmatched click with NULL view
    assert(df.count() >= SparkEntry.queries("q440_band_rewrite")(
      spark, "/root/testdata/sf0.001").count())
  }

  test("NULL keys and times never match (the exec contract)") {
    val df = left.join(right,
      col("k") === col("k2") && abs(col("t") - col("t2")) <= lit(100L))
    assert(hasBandExec(df))
    val tags = df.select("tag", "tag2").as[(String, String)].collect()
    assert(!tags.exists(p => p._1.startsWith("n") || p._2.startsWith("m")))
  }
}
