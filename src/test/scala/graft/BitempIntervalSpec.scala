package graft

import org.scalatest.funsuite.AnyFunSuite

/** q381 bitemporal as-of, q382 interval union, q383 contribution. */
class BitempIntervalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q381 gate frame: corrections only count once visible at T") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q381_bitemporal")(spark, dir)
      .select("o_orderstatus", "n_orders", "n_corrected",
        "believed_total")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, tot) =>
      assert(n > 0 && c >= 0 && c <= n && tot > 0)
    }
    // n_orders must equal the orders placed in the first 60 days
    val o = sources.Tables.orders(spark, dir)
    val firstDay = o.agg(min(to_date(col("o_orderdate")))).head().getDate(0)
    val inWindow = o.filter(to_date(col("o_orderdate")) <=
      date_add(lit(firstDay), 60)).count()
    assert(rows.map(_._2).sum == inWindow)
    // corrected rows are a subset of %37 keys in that window
    val corrEligible = o.filter(col("o_orderkey") % 37 === 0 &&
      to_date(col("o_orderdate")) <= date_add(lit(firstDay), 50)).count()
    assert(rows.map(_._3).sum == corrEligible,
      "a correction is visible iff its +10-day tx date has passed")
  }

  test("q382: closed-form merges on a toy interval set") {
    // [0,10) [5,15) [20,25) -> two merged intervals, coverage 20
    def merge(iv: Seq[(Long, Long)]): (Int, Long) = {
      val sorted = iv.sortBy(identity)
      var n = 0; var cov = 0L
      var curLo = 0L; var curHi = Long.MinValue
      sorted.foreach { case (a, b) =>
        if (a > curHi) { // new group
          if (curHi != Long.MinValue) { n += 1; cov += curHi - curLo }
          curLo = a; curHi = b
        } else curHi = math.max(curHi, b)
      }
      if (curHi != Long.MinValue) { n += 1; cov += curHi - curLo }
      (n, cov)
    }
    assert(merge(Seq((0L, 10L), (5L, 15L), (20L, 25L))) == (2, 20L))
    assert(merge(Seq((0L, 5L), (5L, 10L))) == (1, 10L)) // touching joins
  }

  test("q382 gate frame: coverage bounds and ordering") {
    val rows = SparkEntry.queries("q382_interval_union")(spark, dir)
      .select("user_id", "n_merged", "covered_s", "rnk")
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._4).toSeq == (1 to rows.length))
    rows.foreach { case (_, nm, cov, _) =>
      assert(nm >= 1)
      // each merged interval covers at least one 900s span
      assert(cov >= 900 * nm)
    }
    // ranked by coverage desc
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq)
  }

  test("q383 gate frame: shares sum to 1 per region and globally") {
    val rows = SparkEntry.queries("q383_contribution")(spark, dir)
      .select("r_name", "n_name", "revenue_cents", "share_of_region",
        "share_of_total")
      .as[(String, String, Long, Double, Double)].collect()
    assert(rows.length == 25)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 5e-3)
    }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 5e-3)
    // share_of_total <= share_of_region always
    rows.foreach { case (_, _, _, sr, st) => assert(st <= sr + 1e-9) }
  }
}
