package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — `|left.time − right.time| ≤ maxGap` per key —
  * the other time-join Spark lacks a scalable plan for: written as a
  * plain inequality join Spark can only pick a nested-loop strategy
  * (per-key cartesian), the classic scale-killer.
  *
  * The banding trick makes it a HASH join: bucket each time by
  * `floor(t / maxGap)`; any qualifying pair is at most one bucket
  * apart, so the left side probes its own bucket ± 1 (a 3-row explode)
  * and an equi-join on (key, bucket) + an exact gap filter finds every
  * pair and nothing twice (each right row sits in exactly one bucket —
  * no dedup step). Work is Σ_bucket |L_b|·|R_b| — the true output-bound
  * cost — instead of Σ_key |L_k|·|R_k|. At 100 TB the band histogram is
  * the skew check, exactly like any equi-join key.
  */
object RangeJoin {

  /** All (left, right) pairs with the same key and times within
    * `maxGap` of each other (inclusive). Times must be integral
    * (epoch micros). Output: left columns + the matched right row as
    * one struct column `matchCol`, one output row per qualifying pair.
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, maxGap: Long,
      matchCol: String = "match"): DataFrame = {
    require(maxGap > 0, "maxGap must be positive")
    val reserved = Set("__b", "__rt")
    require(!left.columns.exists(c => reserved(c) || c == matchCol) &&
      !right.columns.exists(reserved),
      s"bandedRangeJoin reserves __b/__rt and '$matchCol'")
    val keyCols = keys.map(col)
    val rPayload = struct(right.columns.map(col).toIndexedSeq: _*)
    // Spark's `/` promotes to double; that is exact here — epoch-micro
    // times (< 2^53) and the gap are both double-representable, and the
    // quotient's ulp is far below 1/maxGap, so floor() can only be
    // wrong within < 1 µs of a boundary and exact multiples divide
    // exactly. (Integral-time contract, documented above.)
    def bucket(t: org.apache.spark.sql.Column) =
      floor(t.cast("long") / lit(maxGap)).cast("long")
    val l = left
      .withColumn("__b0", bucket(col(leftTime)))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r = right.select(keyCols ++ Seq(bucket(col(rightTime)).as("__b"),
      col(rightTime).as("__rt"), rPayload.as(matchCol)): _*)
    l.join(r, keys :+ "__b")
      .filter(abs(col(leftTime) - col("__rt")) <= maxGap)
      .drop("__b", "__rt")
  }
}
