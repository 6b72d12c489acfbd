package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Spectral

/** Fixed-point PCA power iteration (q162): recovery of a planted
  * dominant direction, exactness/determinism of the integer pipeline,
  * and the L∞ normalization contract. */
class SpectralSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planted(n: Int, dims: Int): Seq[(Long, Seq[Float])] = {
    // dominant direction e0+e1 with +-1 amplitude, small deterministic
    // hash noise elsewhere — top eigenvector must align with (1,1,0,…)
    (1 to n).map { r =>
      val sign = if (r % 2 == 0) 1f else -1f
      val v = Array.tabulate(dims) { d =>
        val noise = (((r * 31 + d * 17) % 7) - 3) * 0.01f
        if (d <= 1) sign * 0.4f + noise else noise
      }
      (r.toLong, v.toSeq)
    }
  }

  test("pcaTopComponent recovers a planted direction; deterministic across partitionings") {
    val df = planted(200, 16).toDF("vec_id", "embedding")
    val out = Spectral.pcaTopComponent(df, "embedding", dims = 16, iters = 8)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.length == 16)
    val loading = out.map(_._2)
    // dims 0/1 carry the signal: |loading| near the max, same sign
    assert(math.abs(loading(0)) > 0.9 && math.abs(loading(1)) > 0.9)
    assert(math.signum(loading(0)) == math.signum(loading(1)))
    assert((2 until 16).forall(d => math.abs(loading(d)) < 0.2),
      s"noise dims must stay small: ${loading.toSeq}")
    // L-infinity normalization: max |loading| is exactly 1
    assert(math.abs(loading.map(math.abs).max - 1.0) < 1e-9)
    // explained share dominates on planted data
    assert(out.head._4 > 0.5, s"explained=${out.head._4}")

    val re = Spectral.pcaTopComponent(df.repartition(7), "embedding",
      dims = 16, iters = 8).collect().map(r => (r.getInt(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == re.toSeq, "must be exactly partition-invariant")
  }

  test("pcaTopComponent eigenvalue matches the planted variance scale") {
    val df = planted(200, 16).toDF("vec_id", "embedding")
    val out = Spectral.pcaTopComponent(df, "embedding", dims = 16, iters = 8)
      .collect()
    val eig = out.head.getDouble(2)
    // planted component variance ~ 2*(0.4)^2 = 0.32 per the two signal
    // dims (plus small noise) — the eigenvalue must sit near it
    assert(eig > 0.2 && eig < 0.45, s"eig=$eig")
  }

  test("dims < vector length reads the leading submatrix, not a misaligned buffer") {
    // the flat outer-product buffer is stride-sensitive: asking for a
    // 4-dim component of 16-dim vectors must equal running on vectors
    // pre-truncated to 4 dims (the map-keyed formulation's behavior)
    val df = planted(120, 16).toDF("vec_id", "embedding")
    val sub = Spectral.pcaTopComponent(df, "embedding", dims = 4, iters = 6)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val truncated = df.selectExpr("vec_id",
      "slice(embedding, 1, 4) AS embedding")
    val want = Spectral.pcaTopComponent(truncated, "embedding", dims = 4,
      iters = 6).collect().map(r => (r.getInt(0), r.getDouble(1),
        r.getDouble(2)))
    assert(sub.toSeq == want.toSeq)
    assert(sub.length == 4)
  }
}
