package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral statistics over embedding columns — the PCA/whitening leg
  * of the embedding-pipeline family (q28/q53/q109/q120…): covariance
  * is the distributed part, the eigensolve runs on a bounded dim²
  * tensor under the ANN-fit contract (`Similarity` collects nlist×dim
  * and m×16×dsub tensors the same way; dim² = 4096 longs here).
  *
  * Everything is FIXED-POINT integer arithmetic so the result is a
  * pure function of the input and restates exactly in SQL:
  * coordinates quantize to `floor(v·kq+0.5)` longs, the covariance
  * numerator `M = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ` is an exact BIGINT, and the
  * power iteration renormalizes by an integer divisor under the L∞
  * norm (max is order-independent, unlike a float L2 sum), so every
  * intermediate is an exact integer in BOTH engines and no
  * accumulation-order nondeterminism exists anywhere. The only
  * doubles are final ratios of exact integers (IEEE-identical), and
  * the deliberate `floor(x.toDouble/d)` floordiv — double division of
  * exact inputs is correctly rounded, hence identical cross-engine,
  * which is the portability property we need (Math.floorDiv on longs
  * could disagree with a SQL double-division restatement near exact
  * multiples; the double path cannot).
  *
  * Scale shape: ONE corpus pass builds the dim² product sums, the
  * per-dimension sums AND the row count in a single aggregate over
  * the native `graft_vec_outer_sum`/`graft_vec_sum` kernels
  * ([[graft.expressions.VecOuterSumAgg]]) — each row's outer product
  * multiplies straight into one dim²-long buffer, no per-row d²
  * struct materialization, no d²-fold explode, no d²-key hash
  * aggregate (the r13-verdict covariance constant). One buffer per
  * partition shuffles; dim²+dim longs reach the driver. The
  * iteration cost is O(iters·dim²) on the driver, independent of
  * corpus size. At 100 TB nothing changes but the scan.
  */
object Spectral {

  /** The one-pass covariance-input aggregate: a SINGLE-ROW frame
    * `(sp: array<bigint> of dim², si: array<bigint> of dim, n)` over
    * the kq-quantized coordinates. Exposed (package-private) so
    * PlanSpec can pin the plan shape: one ObjectHashAggregate, no
    * Generate/Expand anywhere. */
  private[graft] def covarianceAgg(emb: DataFrame, vecCol: String,
      kq: Long, dims: Int): DataFrame = {
    // slice to the requested dimension count FIRST: the flat outer
    // buffer is indexed with stride `dims` downstream, so aggregating
    // the full vector when dims < length would misalign every row
    // past the first (the map-keyed formulation silently read the
    // correct submatrix; the flat one must make the stride explicit)
    val qarr = emb.select(expr(
      s"transform(slice($vecCol, 1, $dims), " +
        s"x -> CAST(floor(CAST(x AS DOUBLE) * $kq + 0.5D) AS BIGINT))")
      .as("qa"))
    qarr.agg(
      call_function("graft_vec_outer_sum", col("qa")).as("sp"),
      call_function("graft_vec_sum", col("qa")).as("si"),
      count(lit(1)).as("n"))
  }

  /** Top principal component of `vecCol` (population covariance) by
    * `iters` rounds of integer power iteration from the all-ones
    * start. Returns one row per dimension: `(dim, loading, eigval,
    * explained)` with the L∞-normalized loading (6 dp), the top
    * eigenvalue of the covariance (10 dp) and its explained-variance
    * share of the trace (6 dp).
    */
  def pcaTopComponent(emb: DataFrame, vecCol: String, dims: Int,
      iters: Int = 8, kq: Long = 10000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val aggRow = covarianceAgg(emb, vecCol, kq, dims).head()
    // empty input: graft_vec_sum/graft_vec_outer_sum evaluate to NULL
    // (no rows to size the buffer from) — fail with the real reason
    // before getSeq dereferences a null into a bare NPE
    require(aggRow.getLong(2) > 0 && !aggRow.isNullAt(0) && !aggRow.isNullAt(1),
      "pcaTopComponent: empty input frame — no vectors to fit a " +
        "covariance over")
    val sp = aggRow.getSeq[Long](0)
    val si = aggRow.getSeq[Long](1)
    val n = aggRow.getLong(2)
    require(sp.length == dims * dims && si.length == dims,
      s"covariance buffer is ${sp.length}/${si.length} for dims=$dims — " +
        "input vectors are shorter than the requested dimension count")

    // exact covariance numerator and its /n integer reduction (the
    // outer/elementwise sums are BIGINT-exact, so this is the same
    // integer tensor the explode+groupBy formulation produced)
    val c = Array.tabulate(dims, dims) { (i, j) =>
      val m = n * sp(i * dims + j) - si(i) * si(j)
      math.floor(m.toDouble / n).toLong
    }

    var q = Array.fill(dims)(kq)
    for (_ <- 0 until iters) {
      val s = Array.tabulate(dims)(i =>
        (0 until dims).foldLeft(0L)((acc, j) => acc + c(i)(j) * q(j)))
      val maxabs = s.map(math.abs).max
      val d = math.floor(maxabs.toDouble / kq).toLong + 1L
      q = s.map(x => math.floor(x.toDouble / d).toLong)
    }
    val sFin = Array.tabulate(dims)(i =>
      (0 until dims).foldLeft(0L)((acc, j) => acc + c(i)(j) * q(j)))
    val iStar = (0 until dims).maxBy(i => (math.abs(q(i)), -i))
    val lamC = sFin(iStar).toDouble / q(iStar).toDouble
    val scale = (kq * kq).toDouble
    val eig = lamC / n.toDouble / scale
    val trace = (0 until dims).foldLeft(0L)((a, i) => a + c(i)(i))
      .toDouble / n.toDouble / scale
    val maxq = q.map(math.abs).max

    // MysqlFunctions.oracleRound's semantics (DuckDB round: half away
    // from zero, computed in double arithmetic), on the driver
    def dround(x: Double, s: Int): Double = {
      val p = math.pow(10, s)
      if (x < 0) -math.floor(-x * p + 0.5) / p
      else math.floor(x * p + 0.5) / p
    }
    (0 until dims).map { i =>
      (i, dround(q(i).toDouble / maxq.toDouble, 6), dround(eig, 10),
        dround(eig / trace, 6))
    }.toDF("dim", "loading", "eigval", "explained").orderBy("dim")
  }
}
