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
  final case class Session(user_id: Long, start_ts: java.sql.Timestamp,
      end_ts: java.sql.Timestamp, n_events: Long)

  /** Gap-based sessionization via `flatMapGroupsWithState` with an
    * event-time timeout — the canonical custom-state streaming shape:
    * per-user state holds the open session's bounds; a session closes
    * when a LATER event arrives more than `gapMs` after its end
    * (emitted immediately, matching the batch `CoreQueries.sessionize`
    * semantics even when both sessions' events share a micro-batch) or
    * when the watermark passes its end + `gapMs` (event-time timeout).
    * State is one small struct per ACTIVE user, evicted on timeout —
    * bounded regardless of stream length. */
  def sessionize(events: Dataset[TimedEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[TimedEvent], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
          } else {
            // fold the batch's events in time order, closing a session
            // whenever the next event's gap exceeds gapMs — a single
            // micro-batch may span several sessions
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            var cur = state.getOption
            it.map(_.ts.getTime).toSeq.sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionAgg(math.min(s.start, t),
                    math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += Session(uid, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n)
                  cur = Some(SessionAgg(t, t, 1))
                case None =>
                  cur = Some(SessionAgg(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
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
