package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C}

/** q52 (approx statistics — the 100 TB plan for q50's semantics) vs the
  * exact q50: HyperLogLog++ distinct counts within the sketch's rsd,
  * Greenwald-Khanna percentiles within a tight value tolerance (at
  * accuracy=10000 and test-sized groups the rank error is ≤ 1 rank). */
class QuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx quantiles/distinct track the exact statistics within sketch bounds") {
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = toMap(C.quantileStats(spark, dir))
    val approx = toMap(C.quantileStatsApprox(spark, dir))
    assert(approx.keySet == exact.keySet)
    for (flag <- exact.keys) {
      val (en, emed, ep90) = exact(flag)
      val (an, amed, ap90) = approx(flag)
      assert(math.abs(an - en).toDouble / en <= 0.10,
        s"$flag: HLL++ distinct $an vs exact $en")
      assert(math.abs(amed - emed) / emed <= 0.01,
        s"$flag: approx median $amed vs exact $emed")
      assert(math.abs(ap90 - ep90) / ep90 <= 0.01,
        s"$flag: approx p90 $ap90 vs exact $ep90")
    }
  }
}
