package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization — resampling an irregular event stream
  * onto a fixed grid, the standard preprocessing step for training
  * sequence models on telemetry/market/clickstream data (and the
  * gap-filling query every warehouse grows eventually).
  *
  * Composed from operators the engine already has: the grid is a
  * per-key `sequence` + `explode` (rows are generated distributed,
  * proportional to each key's own span — no driver-side calendar), and
  * the fill is [[AsofJoin.asofBackward]] — ONE keyed shuffle + sort,
  * no per-grid-point probe. At 100 TB both stages scale like any keyed
  * window: a hot key is one sorted partition, and the grid size is
  * span/step rows per key, independent of event count.
  */
object TimeSeries {

  /** Interval concurrency sweep: how many intervals are active at each
    * instant the count changes — the classic +1/−1 boundary sweep
    * (peak concurrent sessions, active connections, load timeline).
    * Endpoints are inclusive: an interval contributes +1 at `start`
    * and −1 at `end + 1`. Returns `(us, n_active)` — one row per
    * distinct boundary instant, `n_active` = concurrency AFTER
    * applying that instant's deltas.
    *
    * The running count is a GLOBAL prefix sum — the single-partition
    * window trap — so it uses the packSequences two-level formulation:
    * per-time-bucket delta totals (tiny aggregate), a running offset
    * over the bucket totals (window over #buckets rows, bounded by
    * timeline/bucketUs), and a within-bucket cumulative window.
    * Identical integers to the naive global cumsum. */
  def concurrencySweep(intervals: DataFrame, startCol: String,
      endCol: String, bucketUs: Long = 3600000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    import org.apache.spark.sql.expressions.Window
    val deltas = intervals.select(col(startCol).as("us"), lit(1L).as("d"))
      .unionAll(intervals.select((col(endCol) + 1L).as("us"), lit(-1L).as("d")))
      .groupBy("us").agg(sum("d").as("delta"))
      .withColumn("__bkt", floor(col("us") / lit(bucketUs)).cast("long"))
    val bucketTotals = deltas.groupBy("__bkt")
      .agg(sum("delta").as("__btotal"))
      .withColumn("__boff",
        // bucket-count frame (one row per bucket) — constant partition
        // key silences the WindowExec single-partition warning
        coalesce(sum("__btotal").over(
          Window.partitionBy(lit(0)).orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bkt", "__boff")
    val win = Window.partitionBy("__bkt").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(bucketTotals, Seq("__bkt"))
      .withColumn("n_active", col("__boff") + sum("delta").over(win))
      .select(col("us"), col("n_active"))
  }

  /** Resample each key's events onto a `stepUs`-spaced grid with
    * forward fill (last observation carried forward): grid points are
    * the multiples of `stepUs` inside each key's [min, max] time span,
    * and each point carries the latest right row at or before it as
    * the struct column `stateCol`. Times are integral epoch
    * microseconds ([[RangeJoin]]'s contract). Grid alignment to
    * absolute epoch multiples (not each key's own min) keeps grids
    * comparable across keys — every key's 06:00 bucket is the same
    * instant.
    *
    * By construction every grid point has at least one event at or
    * before it (the grid starts at ⌈min/step⌉·step), so `stateCol`
    * is never null. The events side must be unique per (keys, time) —
    * [[AsofJoin.asofBackward]]'s determinism contract; dedupe upstream.
    */
  def resampleForwardFill(events: DataFrame, keys: Seq[String],
      timeCol: String, stepUs: Long,
      stateCol: String = "state"): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val keyCols = keys.map(col)
    // ceil(lo/step)·step via exact double floor — epoch-µs < 2^53, so
    // the division is exact to well below one step (RangeJoin's
    // integral-time analysis)
    val bounds = events.groupBy(keyCols: _*)
      .agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
      .withColumn("__g0",
        floor((col("__lo") + lit(stepUs) - 1) / lit(stepUs.toDouble))
          .cast("long") * stepUs)
      // a key whose whole span sits inside one step gap has no grid point
      .filter(col("__g0") <= col("__hi"))
    val grid = bounds.select(
      keyCols :+ explode(sequence(col("__g0"), col("__hi"), lit(stepUs)))
        .as("grid_t"): _*)
    AsofJoin.asofBackward(grid, events, keys, "grid_t", timeCol, stateCol)
  }

  /** Half-life time-decayed aggregation per key — the feature-store
    * "recency-weighted activity" signal (each event's value weighted
    * by `2^(−age/halfLife)`, age measured from the key's LATEST
    * event): `decayed_sum = Σ value·w` and `freshness = Σ value·w / Σ
    * value` (1 = all activity just happened, → 0 = all of it is many
    * half-lives old). Anchoring at the per-key max keeps every weight
    * in (0, 1] — no overflowing `2^(t/h)` terms — and makes the
    * result a pure function of the key's own history.
    *
    * Scale shape: two aggregations on the SAME key (the max-anchor
    * pass and the weighted sum), so the second groupBy reuses the
    * join's hash partitioning — one shuffle of the events, no window,
    * no per-key buffering. */
  def timeDecayedSum(events: DataFrame, keyCol: String, tsUsCol: String,
      valCol: String, halfLifeUs: Long): DataFrame = {
    require(halfLifeUs > 0, "halfLifeUs must be positive")
    import graft.functions.MysqlFunctions.oracleRound
    val mx = events.groupBy(keyCol).agg(max(col(tsUsCol)).as("__mx"))
    events.select(col(keyCol), col(tsUsCol), col(valCol))
      .join(mx, Seq(keyCol))
      .withColumn("__w", pow(lit(2.0),
        (col(tsUsCol) - col("__mx")).cast("double") / lit(halfLifeUs.toDouble)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        oracleRound(sum(col(valCol) * col("__w")), 4).as("decayed_sum"),
        oracleRound(sum(col(valCol) * col("__w")) / sum(col(valCol)), 4)
          .as("freshness"))
  }
}
