package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C}

/** Wave 49 (q427): the daily-count dispersion index — replayed on
  * the driver from raw collected rows. */
class Wave49Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def r4(x: Double): Double =
    if (x < 0) -math.floor(-x * 1e4 + 0.5) / 1e4
    else math.floor(x * 1e4 + 0.5) / 1e4

  test("q429: HHI equals the exact share fold; invariants hold") {
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val per = toks.groupBy(_._1).map { case (s, v) => s -> v.map(_._2).sum }
    val t = per.values.sum
    val hhi = per.values.map(v => BigInt(v) * BigInt(v)).sum.toDouble /
      (t.toDouble * t.toDouble)
    val got = graft.operators.PipelineQueries.mixtureHhi(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == per.size)
    got.foreach { case (s, n, share, h, neff) =>
      assert(n == per(s))
      assert(share == r4x(per(s).toDouble / t, 6))
      assert(h == r4x(hhi, 6))
      assert(neff == r4x(1.0 / r4x(hhi, 6), 4))
    }
    // HHI ∈ [1/k, 1] and shares sum to ~1
    assert(got.head._4 >= 1.0 / per.size - 1e-9 && got.head._4 <= 1.0)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-3)
  }
  private def r4x(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    if (x < 0) -math.floor(-x * p + 0.5) / p else math.floor(x * p + 0.5) / p
  }

  test("q427: dispersion equals exact moment sums; flag matches cross-multiplication") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val got = C.dispersionIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4),
        r.getBoolean(5)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.map(_._2)
      val n = xs.length.toLong
      val s1 = xs.sum
      val s2 = xs.map(x => x * x).sum
      val num = n * s2 - s1 * s1
      val d = num.toDouble / ((n - 1).toDouble * s1.toDouble)
      val row = got.find(_._1 == t).get
      assert(row._2 == n && row._3 == s1)
      assert(row._4 == r4(d))
      assert(row._5 == (num * 2 > (n - 1) * s1 * 3))
    }
  }
}
