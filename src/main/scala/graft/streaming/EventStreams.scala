package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming twins of the batch event operators. The
  * reference is a batch snapshot tool (SURVEY §2.9 — no streaming
  * surface), but the engine's `events` table has a natural streaming
  * shape, and a 100 TB ingest pipeline runs these as continuous jobs:
  * `readStream` → these transforms → `writeStream`, scaling by state
  * partitioning on the grouping key with watermark-bounded state.
  */
object EventStreams {

  /** Event-time windowed aggregation with a watermark — the streaming
    * twin of `CoreQueries.windowAgg`. State per (window, event_type);
    * the watermark bounds how long a window stays open, so state is
    * O(active windows), not O(stream length). */
  def windowedAgg(events: DataFrame, watermark: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup: first occurrence per key within the
    * watermark horizon wins; later duplicates are dropped. The twin of
    * `Dedup.exact` for continuous ingestion — state is the key set
    * inside the horizon, evicted by the watermark. */
  def dedupStream(events: DataFrame, keyCol: String,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double)
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionAgg(start: Long, end: Long, n: Long)
  final case class SessionsState(sessions: Seq[SessionAgg])
  final case class Session(user_id: Long, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp, n_events: Long)

  /** Gap-based sessionization via `flatMapGroupsWithState` with an
    * event-time timeout — the canonical custom-state streaming shape.
    * Per-user state holds EVERY unfinalized session (a micro-batch may
    * span several; an admissible late event may extend or even BRIDGE
    * two of them, so none can be finalized early). A session is emitted
    * only once the watermark passes its end + `gapMs` — at that point
    * no admissible event can touch it, so the output matches the batch
    * `CoreQueries.sessionize` on the same data regardless of batch
    * boundaries or (in-watermark) disorder. State is the per-user list
    * of sessions inside the gap horizon, finalized away as the
    * watermark advances — bounded regardless of stream length. */
  def sessionize(events: Dataset[TimedEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    def emit(uid: Long, s: SessionAgg): Session =
      Session(uid, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n)
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[TimedEvent], state: GroupState[SessionsState]) =>
          val wm = state.getCurrentWatermarkMs()
          // fold new events into the session list: an event merges every
          // session within gapMs of it (possibly bridging two), else
          // opens its own
          var sessions = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          it.map(_.ts.getTime).toSeq.sorted.foreach { t =>
            val (near, far) = sessions.partition(s =>
              t >= s.start - gapMs && t <= s.end + gapMs)
            val merged = near.foldLeft(SessionAgg(t, t, 1L)) { (acc, s) =>
              SessionAgg(math.min(acc.start, s.start),
                math.max(acc.end, s.end), acc.n + s.n)
            }
            sessions = merged +: far
          }
          // finalize sessions the watermark has STRICTLY passed: an
          // event at exactly t == wm is still admissible (Spark's late
          // filter drops only t < wm) and t == end + gapMs still merges
          // under the batch gap rule, so `<=` here would emit a session
          // a boundary event can legally rejoin
          val (done, live) = sessions.partition(s => s.end + gapMs < wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(SessionsState(live))
            // a live session may sit exactly AT the watermark; Spark
            // rejects timeout timestamps <= current watermark
            state.setTimeoutTimestamp(
              math.max(live.map(_.end).min + gapMs, wm + 1))
          }
          done.sortBy(s => (s.start, s.end)).iterator.map(emit(uid, _))
      }
  }

  /** Stream-stream interval join — the streaming twin of
    * `RangeJoin.bandedRangeJoin` (q66): every (left, right) pair of the
    * same key whose event times are within `gap` of each other. This is
    * Structured Streaming's NATIVE time-range join: both sides are
    * watermarked, the join condition carries the time bound, and Spark
    * derives the state-retention window from watermark + bound — each
    * side buffers only `gap + watermark` of history per key. The batch
    * banding trick is unnecessary here; the streaming engine's
    * symmetric hash join already keys state by the equi-column.
    *
    * `joinType` supports the watermark-gated outer variants too
    * ("left_outer"/"right_outer"/"full_outer"): an unmatched row emits
    * null-extended ONLY once the watermark proves no in-gap partner
    * can still arrive — the streaming analogue of the batch outer
    * range join, with the emission delay that correctness requires. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      gap: String = "30 minutes",
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(keyCol), col("event_id").as("left_id"), col("ts").as("lts"))
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("__rk"), col("event_id").as("right_id"),
        col("ts").as("rts"))
    l.join(r,
      col(keyCol) === col("__rk") &&
        col("rts") >= col("lts") - expr(s"INTERVAL $gap") &&
        col("rts") <= col("lts") + expr(s"INTERVAL $gap"),
      joinType)
      // coalesce: under right/full outer the left key is null on
      // unmatched right rows (identity for inner/left)
      .select(coalesce(col(keyCol), col("__rk")).as(keyCol),
        col("left_id"), col("right_id"), col("lts"), col("rts"))
  }

  /** Per-user running totals via `mapGroupsWithState` — the custom-
    * state escape hatch for semantics windowed aggs can't express.
    * State is one `UserStat` per user, hash-partitioned by key. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          val next = it.foldLeft(prev) { (acc, e) =>
            UserStat(uid, acc.n_events + 1, acc.total_value + e.value)
          }
          state.update(next)
          next
      }
  }
}
