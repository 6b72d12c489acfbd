package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q342 association rules, q343 rolling slope, q344 Wilson CI. */
class RulesSlopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q342: lift/confidence closed form on planted baskets") {
    // 10 baskets; items 1,2 together in 4; item 1 in 6, item 2 in 5.
    // lift = 4*10/(6*5) = 1.3333; conf(1->2) = 4/6, conf(2->1) = 4/5
    val rows = (1 to 4).flatMap(k => Seq((k.toLong, 1L), (k.toLong, 2L))) ++
      Seq((5L, 1L), (6L, 1L), (7L, 2L), (8L, 3L), (9L, 3L), (10L, 3L))
    val pp = rows.toDF("l_orderkey", "l_partkey").distinct()
    val nb = pp.select("l_orderkey").distinct().count()
    val item = pp.groupBy("l_partkey").agg(count(lit(1)).as("n_i"))
      .as[(Long, Long)].collect().toMap
    val nab = pp.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(pp.select(col("l_orderkey"), col("l_partkey").as("b")),
        Seq("l_orderkey"))
      .filter(col("a") === 1L && col("b") === 2L).count()
    assert(nb == 10 && item(1L) == 6 && item(2L) == 5 && nab == 4)
    val lift = nab.toDouble * nb / (item(1L) * item(2L))
    assert(math.abs(lift - 4.0 * 10 / 30) < 1e-12)
  }

  test("q342 gate frame: identities hold, lift descending") {
    val out = SparkEntry.queries("q342_assoc_rules")(spark, dir)
      .select("n_ab", "n_a", "n_b", "support", "conf_ab", "conf_ba",
        "lift")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { case (nab, na, nb2, s, cab, cba, l) =>
      assert(nab >= 2 && nab <= math.min(na, nb2))
      assert(s > 0 && cab <= 1.0 && cba <= 1.0 && l > 0)
    }
    assert(out.sliding(2).forall {
      case Array(x, y) => x._7 >= y._7; case _ => true
    })
  }

  test("q343: exact slope on a hand series") {
    // y = 3x + noise 0 over a 7-day window -> slope exactly 3
    val daily = (0 to 9).map(i => (i.toLong, 3L * i + 10L)).toDF("x", "y")
    val w = org.apache.spark.sql.expressions.Window.orderBy("x")
      .rowsBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
    val out = daily.coalesce(1)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .filter(col("n") === 7)
      .select(((col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("slope"))
      .as[Double].collect()
    assert(out.length == 4 && out.forall(s => math.abs(s - 3.0) < 1e-12))
  }

  test("q343 gate frame: every row has a full 7-day window") {
    val out = SparkEntry.queries("q343_rolling_slope")(spark, dir)
      .select("day", "slope_7d").as[(java.sql.Date, Double)].collect()
    assert(out.nonEmpty)
    // slopes bounded by the daily-count range (a line through counts
    // in [0, max] over 6 steps cannot be steeper than max/1)
    val mx = graft.sources.Tables.events(spark, dir)
      .groupBy(to_date(col("ts"))).count()
      .agg(max("count")).head().getLong(0)
    out.foreach { case (_, s) => assert(math.abs(s) <= mx.toDouble) }
  }

  test("q344: Wilson interval brackets the point estimate, shrinks with n") {
    def wilson(correct: Long, n: Long): (Double, Double) = {
      val z = 1.96
      val p = correct.toDouble / n
      val den = 1.0 + z * z / n
      val c = p + z * z / (2.0 * n)
      val s = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
      ((c - s) / den, (c + s) / den)
    }
    val (lo1, hi1) = wilson(80, 100)
    val (lo2, hi2) = wilson(800, 1000)
    assert(lo1 < 0.8 && hi1 > 0.8 && lo2 < 0.8 && hi2 > 0.8)
    assert(hi2 - lo2 < hi1 - lo1) // tighter at larger n
    assert(lo1 > 0.70 && hi1 < 0.88) // textbook 80/100 interval
  }

  test("q344 gate frame: bounds bracket acc and stay in [0,1]") {
    val out = SparkEntry.queries("q344_wilson_ci")(spark, dir)
      .select("n", "correct", "acc", "wilson_lo", "wilson_hi")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.length == 5)
    out.foreach { case (n, c, acc, lo, hi) =>
      assert(c <= n)
      assert(lo >= 0.0 && hi <= 1.0)
      assert(lo <= acc + 1e-9 && acc <= hi + 1e-9)
    }
  }
}
