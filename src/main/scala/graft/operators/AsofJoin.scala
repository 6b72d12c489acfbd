package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — an operator Spark's built-in joins lack: for
  * each left row, attach the LATEST right row whose time is at or
  * before the left row's time, per key (the standard point-in-time /
  * "most recent state" join of event and market-data processing).
  *
  * Implementation is the union-and-window formulation, not a range
  * join: tag both sides, union on (key, time, side), and carry the
  * right payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding row frame. ONE shuffle on the key and a
  * per-partition sort — no time-bucket explosion, no per-left-row
  * probe, and skew behaves like any keyed window (a hot key is one
  * sorted partition). This is the plan you want at 100 TB: a range
  * join needs banding + dedup and still degrades on sparse right
  * sides; the window formulation is linear in |left|+|right| after
  * the sort.
  *
  * Tie semantics (pinned): a right row at exactly the left row's time
  * MATCHES (side orders right before left at equal times) — the same
  * `left.t >= right.t` contract as DuckDB/pandas ASOF joins, which is
  * what makes the result oracle-verifiable.
  *
  * CONTRACT: `right` must be unique per (keys, rightTime) — equal-time
  * right duplicates have no defined "latest"; dedupe upstream (e.g.
  * max-id per key/time) to keep the result deterministic on ANY engine.
  */
object AsofJoin {

  /** Left as-of-backward join. The full matched right row arrives as
    * one nullable struct column `asofCol` (null = no right row at or
    * before); the left row's columns pass through unchanged. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      asofCol: String = "asof"): DataFrame = {
    val reserved = Set("__t", "__side", "__rp", "__lp")
    require(!left.columns.exists(c => reserved(c) || c == asofCol) &&
      !right.columns.exists(reserved),
      s"asofBackward reserves ${reserved.mkString("/")} and '$asofCol'")
    require(keys.forall(left.columns.contains) && keys.forall(right.columns.contains),
      s"keys ${keys.mkString(",")} must exist on both sides")
    val rPayload = struct(right.columns.map(col).toIndexedSeq: _*)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*)
    val rType = right.select(rPayload.as("p")).schema.head.dataType
    val lType = left.select(lPayload.as("p")).schema.head.dataType
    val keyCols = keys.map(col)
    val lTagged = left.select(keyCols ++ Seq(
      col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(rType).as("__rp"), lPayload.as("__lp")): _*)
    val rTagged = right.select(keyCols ++ Seq(
      col(rightTime).as("__t"), lit(0).as("__side"),
      rPayload.as("__rp"), lit(null).cast(lType).as("__lp")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn(asofCol, last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lp.*"), col(asofCol))
  }

  /** Forward as-of join — the mirror: for each left row, the EARLIEST
    * right row at or after its time, per key (next-touch attribution,
    * time-to-next-event). Same union+window architecture with the
    * frame reversed: left orders BEFORE right at equal times (so an
    * equal-time right matches — the `left.t <= right.t` contract
    * DuckDB's forward ASOF shares) and the first non-null right
    * payload in the current-row→unbounded-following frame wins. Same
    * one-shuffle/one-sort scale shape and the same right-side
    * uniqueness contract as [[asofBackward]]. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      asofCol: String = "asof"): DataFrame = {
    val reserved = Set("__t", "__side", "__rp", "__lp")
    require(!left.columns.exists(c => reserved(c) || c == asofCol) &&
      !right.columns.exists(reserved),
      s"asofForward reserves ${reserved.mkString("/")} and '$asofCol'")
    val rPayload = struct(right.columns.map(col).toIndexedSeq: _*)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*)
    val rType = right.select(rPayload.as("p")).schema.head.dataType
    val lType = left.select(lPayload.as("p")).schema.head.dataType
    val keyCols = keys.map(col)
    val lTagged = left.select(keyCols ++ Seq(
      col(leftTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(rType).as("__rp"), lPayload.as("__lp")): _*)
    val rTagged = right.select(keyCols ++ Seq(
      col(rightTime).as("__t"), lit(1).as("__side"),
      rPayload.as("__rp"), lit(null).cast(lType).as("__lp")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lTagged.unionByName(rTagged)
      .withColumn(asofCol, first(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__lp.*"), col(asofCol))
  }
}
