package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q330 weighted median, q331 Gumbel block maxima, q332 Jarque-Bera. */
class TailStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q330: hand-computed weighted median, including the tie case") {
    // group A: values 1..4, weights 1,1,1,7 -> W=10, crossing at v=4
    // group B: equal values 5,5 with weights 1,9 -> crossing value 5
    // group C: symmetric 1(w5), 9(w5) -> 2*cum>=10 first at v=1
    val base = Seq(("A", 1.0, 1L), ("A", 2.0, 1L), ("A", 3.0, 1L),
        ("A", 4.0, 7L), ("B", 5.0, 1L), ("B", 5.0, 9L),
        ("C", 1.0, 5L), ("C", 9.0, 5L))
      .toDF("g", "v", "w")
    val win = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("v").rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = base
      .withColumn("cum", sum(col("w")).over(win))
      .withColumn("tot", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("g").agg(min("v").as("m"))
      .as[(String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("A", 4.0), ("B", 5.0), ("C", 1.0)))
  }

  test("q330 gate frame: median is within each group's value range") {
    val out = SparkEntry.queries("q330_weighted_median")(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(out.length == 3)
    val ranges = graft.sources.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    out.foreach { case (f, w, m) =>
      assert(w > 0)
      val (lo, hi) = ranges(f); assert(m >= lo && m <= hi)
    }
  }

  test("q331: closed-form Gumbel params from pinned moments") {
    val out = SparkEntry.queries("q331_gumbel_maxima")(spark, dir)
      .as[(Long, Double, Double, Double, Double, Double)].head()
    val (n, mean, sd, loc, scale, rl30) = out
    assert(n > 0 && sd > 0)
    val expScale = sd * math.sqrt(6.0) / math.Pi
    val expLoc = mean - 0.5772156649 * expScale
    val expRl = expLoc - expScale * math.log(-math.log(1.0 - 1.0 / 30))
    assert(math.abs(scale - expScale) < 5e-4)
    assert(math.abs(loc - expLoc) < 5e-4)
    assert(math.abs(rl30 - expRl) < 5e-4)
    // return level sits above the fitted location for T > e/(e-1)
    assert(rl30 > loc)
  }

  test("q332: JB of a symmetric two-point distribution is n/6*(K-3)^2/4 with K=1") {
    // values ±1, equal counts: mean 0, skew 0, kurtosis m4/m2^2 = 1
    // -> JB = n/6 * (0 + 4/4) = n/6
    val d = (Seq.fill(30)(1.0) ++ Seq.fill(30)(-1.0)).toDF("x")
    val mu = d.agg(avg("x").as("mu")).head().getDouble(0)
    assert(mu == 0.0)
    val s = d.withColumn("d", col("x") - lit(mu))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("d") * col("d")).as("s2"),
        sum(col("d") * col("d") * col("d")).as("s3"),
        sum(col("d") * col("d") * col("d") * col("d")).as("s4"))
      .head()
    val (n, s2, s3, s4) =
      (s.getDouble(0), s.getDouble(1), s.getDouble(2), s.getDouble(3))
    val skew = (s3 / n) / math.pow(s2 / n, 1.5)
    val kurt = (s4 / n) / math.pow(s2 / n, 2.0)
    val jb = n / 6.0 * (skew * skew + math.pow(kurt - 3.0, 2.0) / 4.0)
    assert(skew == 0.0 && kurt == 1.0)
    assert(math.abs(jb - n / 6.0) < 1e-12)
  }

  test("q332 gate frame: uniform-ish quantity is flagged non-normal") {
    val out = SparkEntry.queries("q332_jarque_bera")(spark, dir)
      .select("n", "skew", "kurt", "jb", "reject_normal")
      .as[(Long, Double, Double, Double, Int)].collect()
    assert(out.length == 3)
    out.foreach { case (n, skew, kurt, jb, rej) =>
      assert(n > 100)
      // quantity is uniform on [1,50]: near-zero skew, platykurtic
      assert(math.abs(skew) < 0.5 && kurt < 2.5)
      assert(jb > 5.991 && rej == 1)
    }
  }
}
