package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{MysqlFunctions => M}

/** In-engine AdaBoost with decision stumps (Freund & Schapire '97,
  * discrete AdaBoost) — the second trained model beside the q446
  * logistic filter, and the classic "is this label learnable from
  * cheap numeric signals?" probe a curation stack runs before paying
  * for a real classifier. Expressed as the q53-Lloyd / q446 pattern:
  * the MODEL (one stump + α per round) is driver-sized and collected +
  * re-broadcast as literals, while the DATA only feeds keyed
  * aggregates — per round one broadcast-hypothesis join + one
  * map-side-combined aggregate over ~90 hypothesis groups, then one
  * map-only weight update. Nothing corpus-sized is collected or
  * shuffled; the shape survives 100 TB unchanged.
  *
  * Determinism contract (DuckDB-oracle-able): candidate thresholds
  * are the 4-dp-pinned exact percentiles at k/16 (k = 1..15 — all
  * exact binary fractions, the q101 quantile-parity rule); per-doc
  * weights are 6-dp-rounded doubles whose error/total sums are
  * DECIMAL (order-free); the weighted error is 6-dp-pinned BEFORE
  * the argmin, which tie-breaks on (err, feat, thr, pol); α is
  * 6-dp-pinned before it feeds exp(). Every float chain is mirrored
  * op-for-op in the oracle SQL.
  */
object Boosting {

  /** One trained round: stump (feat, thr ≤ → pol), its 6-dp weighted
    * error under the round's weights, and the 6-dp α. */
  final case class Stump(t: Int, feat: Int, thr: Double, pol: Int,
      err: Double, alpha: Double)

  /** round-half-away-from-zero at `s` decimals — the driver-side twin
    * of [[MysqlFunctions.oracleRound]]. */
  private def rnd(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    if (x < 0) -math.floor(-x * p + 0.5) / p else math.floor(x * p + 0.5) / p
  }

  private val ps: Seq[Double] = (1 to 15).map(_ / 16.0)

  /** Candidate stumps: per feature, the distinct 4-dp-pinned exact
    * percentiles at k/16 of the long-form `(feat, fv)` frame, crossed
    * with both polarities. Driver-sized (≤ 90 rows). */
  def hypotheses(fv: DataFrame): Seq[(Int, Double, Int)] = {
    val qs = fv.groupBy("feat")
      .agg(expr(s"percentile(fv, array(${ps.mkString(", ")}))").as("qs"))
      .collect()
      .flatMap(r => r.getSeq[Double](1).map(q => (r.getInt(0), rnd(q, 4))))
      .distinct
    qs.flatMap { case (f, t) => Seq((f, t, 1), (f, t, -1)) }
      .sortBy(h => (h._1, h._2, h._3)).toSeq
  }

  /** Train `iters` rounds over `fv` = `(doc_id, y ∈ {+1,-1}, feat,
    * fv)` (long form, one row per doc per feature). Returns the stump
    * sequence; weights start at 1.0 (unnormalized — ε is a ratio). */
  def train(spark: SparkSession, fv: DataFrame, iters: Int): Seq[Stump] = {
    val hyp = hypotheses(fv)
    import spark.implicits._
    val hypDf = hyp.toDF("feat", "thr", "pol")
    var wDf = fv.select(col("doc_id")).distinct()
      .withColumn("w", lit(1.0)).localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[Stump]
    for (t <- 1 to iters) {
      val errs = fv.join(wDf, Seq("doc_id"))
        .join(broadcast(hypDf), Seq("feat"))
        .withColumn("__h",
          when(col("fv") <= col("thr"), col("pol")).otherwise(-col("pol")))
        .groupBy("feat", "thr", "pol")
        .agg(
          sum(when(col("__h") =!= col("y"), col("w").cast("decimal(24,6)"))
            .otherwise(lit(0).cast("decimal(24,6)"))).as("mw"),
          sum(col("w").cast("decimal(24,6)")).as("tw"))
        .select(col("feat"), col("thr"), col("pol"),
          M.oracleRound(col("mw").cast("double") / col("tw").cast("double"),
            6).as("err"))
        .collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getInt(2), r.getDouble(3)))
      val (feat, thr, pol, err) =
        errs.minBy(e => (e._4, e._1, e._2, e._3))
      val ec = math.min(math.max(err, 0.000001), 0.999999)
      val alpha = rnd(0.5 * math.log((1.0 - ec) / ec), 6)
      out += Stump(t, feat, thr, pol, err, alpha)
      val prev = wDf
      wDf = fv.filter(col("feat") === lit(feat))
        .join(wDf, Seq("doc_id"))
        .withColumn("__h",
          when(col("fv") <= lit(thr), lit(pol)).otherwise(lit(-pol)))
        .withColumn("w", M.oracleRound(col("w") *
          when(col("__h") =!= col("y"), lit(math.exp(alpha)))
            .otherwise(lit(math.exp(-alpha))), 6))
        .select("doc_id", "w").localCheckpoint()
      // the superseded round's weights are dead — free the blocks
      // (the q75-q79 lesson; at corpus scale each pin is corpus-sized)
      org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(prev)
    }
    // the FINAL round's weights are dead too once the stumps are
    // collected — nothing returned references wDf, so don't leave one
    // corpus-sized (doc_id, w) frame pinned for the session
    org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(wDf)
    out.toSeq
  }

  /** The model as a table: `(t, feat, thr, pol, err, alpha)`. */
  def modelTable(spark: SparkSession, stumps: Seq[Stump]): DataFrame = {
    import spark.implicits._
    stumps.map(s => (s.t, s.feat, s.thr, s.pol, s.err, s.alpha))
      .toDF("t", "feat", "thr", "pol", "err", "alpha")
  }

  /** Per-doc additive scores over the WIDE frame `(doc_id, y, f1, f2,
    * f3)`: score = Σ α_t·h_t(x) (4-dp-pinned), pred = sign on the raw
    * sum. Map-only — the stumps are literals. */
  def scores(wide: DataFrame, stumps: Seq[Stump]): DataFrame = {
    def h(s: Stump): Column = {
      val f = col(s"f${s.feat}")
      when(f <= lit(s.thr), lit(s.pol.toDouble)).otherwise(lit(-s.pol.toDouble))
    }
    val raw = stumps.map(s => lit(s.alpha) * h(s)).reduceLeft(_ + _)
    wide.select(col("doc_id"), col("y").as("label"),
      M.oracleRound(raw, 4).as("score"),
      when(raw >= 0, 1).otherwise(-1).as("pred"))
  }
}
