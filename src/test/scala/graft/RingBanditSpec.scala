package graft

import org.scalatest.funsuite.AnyFunSuite

/** q385 hash ring, q386 deletion cascade, q387 bandit replay. */
class RingBanditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("q385 gate frame: every panel places every key exactly once") {
    val rows = SparkEntry.queries("q385_hash_ring")(spark, dir)
      .select("n_vnodes", "n_keys", "max_share", "min_share", "cv_load")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 16L, 256L))
    val nUsers = sources.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    rows.foreach { case (_, nk, mx, mn, cv) =>
      assert(nk == nUsers) // no key dropped or double-assigned
      assert(mn >= 0.0 && mn <= 1.0 / 8 + 1e-9)
      assert(mx >= 1.0 / 8 - 1e-9 && mx <= 1.0)
      assert(cv >= 0.0)
    }
    // more vnodes smooth the ring: 256 vnodes beats 1 vnode on CV
    val byV = rows.map(r => r._1 -> r._5).toMap
    assert(byV(256L) < byV(1L))
  }

  test("q386 gate frame: the cascade is closed and proportional") {
    val rows = SparkEntry.queries("q386_deletion_cascade")(spark, dir)
      .select("table", "n_deleted", "n_total", "share")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("customer", "lineitem", "orders"))
    val m = rows.map(r => r._1 -> r).toMap
    assert(m("customer")._2 > 0)
    rows.foreach { case (_, d, t, sh) =>
      assert(d <= t)
      assert(math.abs(sh - d.toDouble / t) < 1e-3)
    }
    // cascade completeness: deleted lineitems == lineitems of deleted
    // orders, recomputed independently
    import org.apache.spark.sql.functions._
    val delCust = sources.Tables.customer(spark, dir).select("c_custkey")
      .filter(functions.TextFunctions.md5Int(
        concat(lit("del:"), col("c_custkey").cast("string")), 8)
        % 100 === 0)
    val delOrd = sources.Tables.orders(spark, dir)
      .join(delCust, col("o_custkey") === col("c_custkey"))
    val delLi = sources.Tables.lineitem(spark, dir)
      .join(delOrd.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(m("orders")._2 == delOrd.count())
    assert(m("lineitem")._2 == delLi)
  }

  test("q387 gate frame: one pick per day, regret accumulates correctly") {
    val rows = SparkEntry.queries("q387_bandit_replay")(spark, dir)
      .select("chosen", "forced", "reward", "best_reward", "cum_regret")
      .as[(String, Int, Double, Double, Double)].collect()
    assert(rows.length == 30)
    // replayed regret matches its own running sum (4dp pins)
    var run = 0.0
    rows.foreach { case (arm, f, r, br, cum) =>
      assert(Set("click", "view", "purchase", "signup", "error")(arm))
      assert(f == 0 || f == 1)
      run += br - r
      assert(math.abs(cum - run) < 5e-3)
    }
    // greedy days dominate (10% forced in expectation)
    assert(rows.count(_._2 == 1) <= 10)
  }
}
