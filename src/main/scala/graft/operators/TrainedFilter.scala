package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{MysqlFunctions, TextFunctions}

/** In-engine trained quality filter: full-batch logistic regression
  * over hashed bag-of-words features — the fastText-style binary
  * classifier every production curation stack trains to route
  * documents (CCNet's LM-vs-web filter, Brown et al.'s GPT-3
  * WebText-vs-CommonCrawl quality model; hashing-trick features per
  * Weinberger et al., ICML'09) — expressed as the q53-Lloyd pattern:
  * the MODEL is driver-sized (B+1 weights) and is collected +
  * re-broadcast as a literal each round, while the DATA only ever
  * feeds map-side-combined keyed aggregates. Nothing corpus-sized is
  * collected, joined all-pairs, or shuffled beyond the per-doc and
  * per-bucket gradient aggregates — the exact shape that survives
  * 100 TB (the gradient is one tree-aggregate per pass; the corpus
  * never moves).
  *
  * Determinism contract (cross-engine, DuckDB-oracle-able): weights
  * live in integer MICRO-UNITS (longs, 1e-6 resolution), so every
  * per-doc feature sum and every gradient sum is exact long
  * arithmetic — order-independent by construction. The only float ops
  * per round are the fixed-shape scalar chain
  * `z = (bu + su)/1e6 → p = 1/(1+exp(−z)) → pu = ⌊p·1e6 + 0.5⌋`
  * and the update step `Δ = roundL(lr·gu/N)` — each a sequence of
  * IEEE-exact ops over identical inputs, mirrored op-for-op in the
  * oracle SQL.
  */
object TrainedFilter {

  /** round-half-away-from-zero to a long — the integer-scale twin of
    * [[MysqlFunctions.oracleRound]] (and DuckDB `round()`), applied on
    * the DRIVER to the collected gradient (the model update is driver
    * math in the Lloyd pattern; the oracle states the same CASE). */
  private def roundL(x: Double): Long =
    if (x < 0) -math.floor(-x + 0.5).toLong else math.floor(x + 0.5).toLong

  /** `(doc_id, j)` DISTINCT hashed-bucket presence features from a
    * token-array stage `(doc_id, …, a)` — binary bag-of-buckets, the
    * hashing trick (bucket = md5("lrf:"+token) mod B). Docs with no
    * tokens simply have no rows (they still train/score through the
    * bias via the left join). */
  def hashedFeatures(arrs: DataFrame, buckets: Int): DataFrame =
    arrs.select(col("doc_id"), explode(col("a")).as("w"))
      .select(col("doc_id"), pmod(
          TextFunctions.md5Int(concat(lit("lrf:"), col("w")), 8),
          lit(buckets.toLong)).cast("int").as("j"))
      .distinct()

  /** Train micro-unit weights: `iters` full-batch GD rounds from
    * w=0, b=0 with rate `lr`. Returns `(wu[0..B), bu)`. `labels` is
    * `(doc_id, y∈{0,1})` for EVERY doc (token-less docs included —
    * they carry bias gradient); `feats` as per [[hashedFeatures]],
    * pre-materialized by the caller (read from two plan positions per
    * round). Per round: one per-doc long-sum aggregate, one per-bucket
    * long-sum aggregate (B rows collected), one 1-row bias aggregate.
    */
  def trainLogistic(labels: DataFrame, feats: DataFrame, buckets: Int,
      iters: Int, lr: Double, nDocs: Long): (Array[Long], Long) = {
    var wu = Array.fill(buckets)(0L)
    var bu = 0L
    for (_ <- 1 to iters) {
      val e = residuals(labels, feats, wu, bu).localCheckpoint()
      val gj = feats.join(e, Seq("doc_id"))
        .groupBy("j").agg(sum(col("e")).as("gu"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val gb = e.agg(sum(col("e")).as("gu")).head().getLong(0)
      wu = wu.zipWithIndex.map { case (w, j) =>
        w - roundL(lr * gj.getOrElse(j, 0L).toDouble / nDocs) }
      bu = bu - roundL(lr * gb.toDouble / nDocs)
    }
    (wu, bu)
  }

  /** `(doc_id, y, pu, e)` under the given micro-weights: exact long
    * feature sums, the fixed-shape sigmoid chain, micro-residual
    * `e = pu − y·1e6`. Shared by the training rounds and the final
    * scorer so engine and oracle cannot drift between the two. */
  private def residuals(labels: DataFrame, feats: DataFrame,
      wu: Array[Long], bu: Long): DataFrame = {
    val wlit = typedlit(wu.toSeq)
    val sums = feats
      .select(col("doc_id"), element_at(wlit, col("j") + 1).as("__w"))
      .groupBy("doc_id").agg(sum(col("__w")).as("__su"))
    labels.join(sums, Seq("doc_id"), "left")
      .withColumn("__z",
        (lit(bu) + coalesce(col("__su"), lit(0L))).cast("double") / lit(1e6))
      .withColumn("__p", lit(1.0) / (lit(1.0) + exp(-col("__z"))))
      .withColumn("pu", floor(col("__p") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("e", col("pu") - col("y") * lit(1000000L))
      .select(col("doc_id"), col("y"), col("__p").as("p"),
        col("pu"), col("e"))
  }

  /** [[residuals]] exposed at micro resolution — `(doc_id, y, p, pu,
    * e)` — for consumers that need the exact integer-micro probability
    * (the q454 IPW propensity: `pu/1e6` is an exact rational, so the
    * inverse-weight chain stays oracle-mirrorable). */
  def microScores(labels: DataFrame, feats: DataFrame,
      wu: Array[Long], bu: Long): DataFrame =
    residuals(labels, feats, wu, bu)

  /** Per-doc scores under trained weights: `(doc_id, label, score
    * 4-dp, pred)` — `pred = 1 ⇔ p ≥ 0.5` (exactly 0.5 only when the
    * integer logit is exactly 0, identical on both engines). */
  def scoreLogistic(labels: DataFrame, feats: DataFrame,
      wu: Array[Long], bu: Long): DataFrame =
    residuals(labels, feats, wu, bu)
      .select(col("doc_id"), col("y").as("label"),
        MysqlFunctions.oracleRound(col("p"), 4).as("score"),
        when(col("p") >= 0.5, 1).otherwise(0).as("pred"))

  /** The trained model as a table: bucket rows `j = 0..B-1` plus the
    * bias as `j = -1`, weights back on the real scale (`wu/1e6` — an
    * exact-input IEEE division, identical across engines). */
  def weightsTable(spark: org.apache.spark.sql.SparkSession,
      wu: Array[Long], bu: Long): DataFrame = {
    import spark.implicits._
    ((-1, bu) +: wu.toSeq.zipWithIndex.map { case (w, j) => (j, w) })
      .toDF("j", "wu")
      .select(col("j"), (col("wu").cast("double") / lit(1e6)).as("w"))
  }
}
