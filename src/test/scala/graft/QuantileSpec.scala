package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C}

/** q52 (approx statistics — the 100 TB plan for q50's semantics) emits
  * deterministic facts: the exact statistics plus booleans proving each
  * sketch (HLL++ distinct count, Greenwald-Khanna percentiles at
  * accuracy 10000) landed inside its published error bound. The spec
  * pins both halves: exact columns equal q50's, and every `*_in_bound`
  * flag is true. */
class QuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q52 emits exact stats plus all-true sketch-bound proofs") {
    val exact = C.quantileStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val rows = C.quantileStatsApprox(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    for (r <- rows) {
      val flag = r.getString(0)
      assert((r.getLong(1), r.getDouble(2), r.getDouble(3)) == exact(flag),
        s"$flag: exact columns diverge from q50")
      for ((name, idx) <- Seq("median_in_bound" -> 4, "p90_in_bound" -> 5,
          "ndv_in_bound" -> 6))
        assert(r.getBoolean(idx), s"$flag: $name is false — sketch outside bound")
    }
  }
}
