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

  /** Streaming KMV distinct estimation per event-time window — the
    * twin of `CoreQueries.kmvWindows`, and the reason that aggregate is
    * a typed [[graft.functions.KmvDistinctAgg]] rather than a
    * composition: a mergeable Aggregator runs UNCHANGED under a
    * watermarked streaming window with per-window state of exactly k
    * longs (an exact `collect_set`/`countDistinct` would buffer every
    * distinct key per open window — unbounded in the key cardinality;
    * Spark rejects countDistinct in streaming for precisely that
    * reason, so the sketch IS the streaming form of the query).
    * In-watermark disorder commutes because the k-set union is
    * order-independent (the q141 merge argument) — the disordered
    * batch-parity spec pins it. `hashCol` must carry the md5-derived
    * 60-bit hashes of the tracked key (the closed-form convention). */
  def kmvWindowStream(events: DataFrame, hashCol: String, k: Int,
      watermark: String = "1 hour",
      windowLen: String = "1 day"): DataFrame = {
    val est = org.apache.spark.sql.functions.udaf(
      new graft.functions.KmvDistinctAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.MysqlFunctions.oracleRound(
          est(col(hashCol)), 4).as("est_keys"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").cast("date").as("day"),
        col("est_keys"), col("n_events"))
  }

  /** Streaming twin of `CoreQueries.hllWindows` — the same
    * [[graft.functions.HllDistinctAgg]] mergeable Aggregator under a
    * watermarked window. State per open window is m = 2^p register
    * BYTES (64 at p=6), constant in both stream length and key
    * cardinality — the strictly-bounded end of the windowed-distinct
    * spectrum (exact `collect_set` → KMV k-longs → HLL m-bytes). */
  def hllWindowStream(events: DataFrame, hashCol: String, p: Int,
      watermark: String = "1 hour",
      windowLen: String = "1 day"): DataFrame = {
    val est = org.apache.spark.sql.functions.udaf(
      new graft.functions.HllDistinctAgg(p),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.MysqlFunctions.oracleRound(
          est(col(hashCol)), 4).as("est_keys"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").cast("date").as("day"),
        col("est_keys"), col("n_events"))
  }

  /** Streaming daily-count maintenance — the stream half of the q247
    * mean-shift monitor. The two-window detector needs lag/lead over
    * the GLOBAL day axis, which streaming cannot express (a day's
    * post-window closes six days later); the streamable contract is
    * therefore "maintain the daily frame incrementally" (state: one
    * count per open window, watermark-evicted), with the shared
    * [[graft.operators.CoreQueries.meanShiftFromDaily]] detector
    * reading the emitted table — exactly how production monitors
    * split ingest from alerting. Within-watermark disorder commutes
    * (counts are order-free); the parity spec pins stream==batch
    * daily frames and identical detector output. */
  def dailyCountStream(events: DataFrame,
      watermark: String = "1 day",
      windowLen: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).cast("double").as("x"))
      .select(col("window.start").cast("date").as("day"), col("x"))

  /** Streaming exact dedup: first occurrence per key within the
    * watermark horizon wins; later duplicates are dropped. The twin of
    * `Dedup.exact` for continuous ingestion — state is the key set
    * inside the horizon, evicted by the watermark. */
  def dedupStream(events: DataFrame, keyCol: String,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming twin of `Dedup.dedupAgainstReferenceFps` — continuous
    * ingestion against a STATIC accumulated-reference fingerprint
    * table (the q100/q104 contract's always-on form): each arriving
    * doc is fingerprinted; in-stream duplicates inside the watermark
    * horizon are DROPPED by the dedup state (the streaming analogue of
    * the batch `dup_in_batch` rows — emitting them would need a
    * stream-stream self join after a stateful op, deliberately out of
    * contract), and each surviving canonical is classified
    * `dup_of_ref` / `new` by a stream-static left join (Spark
    * broadcasts or re-reads the static side per micro-batch, no
    * stream-side shuffle of text). The reference text is never read
    * (fingerprint table only), matching the batch plan's contract.
    * Day-close maintenance (merging accepted fingerprints back) stays
    * a batch job (`Dedup.mergedReferenceFps`) — the standard lambda
    * split.
    *
    * `docs` needs (ts, idCol, textCol). Output: (ts, idCol, fp,
    * status) — one row per canonical. CANONICAL RULE: the canonical
    * per fingerprint is the FIRST PROCESSING-ORDER arrival
    * (`dropDuplicatesWithinWatermark` keeps whatever it saw first),
    * NOT the batch twin's min(doc_id) — under disordered arrival the
    * two paths intentionally keep a different representative of the
    * same duplicate group (the group membership and the
    * dup_of_ref/new classification agree; only WHICH id represents
    * the group differs). A min-id streaming canonical would have to
    * buffer every group until its watermark closed — trading the
    * zero-latency emit for no semantic gain downstream, since
    * canonicals are interchangeable group representatives. Both the
    * in-order parity (ids equal) and the disordered contract (same
    * groups, first-arrival representative) are pinned in
    * StreamingMultimodalSpec. */
  def incrementalDedupStream(docs: DataFrame, idCol: String,
      textCol: String, refFps: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    val fped = docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark("ts", watermark)
    // first-in-stream occurrence per fingerprint survives this; the
    // survivors then split ref-dup vs new on the static table
    // distinct on the static side mirrors the batch twin's contract
    // ("need not be pre-distinct") — a duplicated reference fingerprint
    // would otherwise multiply matching canonicals through the join
    fped.dropDuplicatesWithinWatermark("fp")
      .join(refFps.select(col("fp")).distinct().withColumn("__inref", lit(1)),
        Seq("fp"), "left")
      .select(col("ts"), col(idCol), col("fp"),
        when(col("__inref").isNotNull, lit("dup_of_ref"))
          .otherwise(lit("new")).as("status"))
  }

  /** Streaming NEAR-dup against a static reference — the q104
    * persisted-stage contract's always-on form, and the near-dup
    * sibling of [[incrementalDedupStream]]: each arriving doc is
    * shingled and MinHash-signed PER ROW (`Dedup.minHashSigRow` — a
    * map-only expression, so the whole pipeline needs NO stateful
    * streaming aggregation), its LSH band hashes join the persisted
    * reference buckets (stream-static), and surviving candidates are
    * exact-Jaccard-verified against the persisted reference shingle
    * sets (stream-static again; the incoming shingle array rides the
    * row). The only stateful op is the candidate de-dup within the
    * watermark (a doc colliding with the same reference doc in
    * several bands). The hot-bucket cap is NOT applied on the stream
    * side (the reference buckets are static — cap them when
    * persisting); documented boundary vs the batch plan.
    *
    * `docs` needs (ts, idCol, textCol); `refSets`/`refSigs` are the
    * persisted stage tables ([[graft.operators.Dedup.shingleSets]] /
    * `minHashSigsFromSets` output). Returns append rows
    * `(ts, idCol, ref_id, jaccard)` with jaccard ≥ threshold. */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
      refSets: DataFrame, refSigs: DataFrame, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7,
      watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val refB = Dedup.lshBuckets(
      refSigs.withColumnRenamed(idCol, "__rid"), "__rid", bands)
    val inc = docs.withWatermark("ts", watermark)
      .withColumn("__sh", Dedup.shingles(col(textCol), shingleSize))
      .withColumn("__sig", Dedup.minHashSigRow(col("__sh"), numHashes))
      .select(col("ts"), col(idCol), col("__sh"),
        posexplode(Dedup.bandBuckets(col("__sig"), bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cands = inc.join(refB, Seq("band", "bucket"))
      .dropDuplicatesWithinWatermark(idCol, "__rid")
    cands
      .join(refSets.select(col(idCol).as("__rid"), col("__sh").as("__rsh")),
        Seq("__rid"))
      .withColumn("__inter", size(array_intersect(col("__sh"), col("__rsh"))))
      .withColumn("jaccard", graft.functions.MysqlFunctions.oracleRound(
        col("__inter").cast("double") /
          (size(col("__sh")) + size(col("__rsh")) - col("__inter")).cast("double"),
        4))
      .filter(col("jaccard") >= threshold)
      .select(col("ts"), col(idCol), col("__rid").as("ref_id"), col("jaccard"))
  }

  /** Streaming twin of `CorpusOps.bloomDecontaminateFromSets` —
    * continuous benchmark decontamination against a STATIC bench
    * shingle-set table (the q61/q114 scan's always-on form). The bench
    * shingles fold into a Bloom filter ONCE at plan build; each
    * arriving doc is probed IN-SCAN (`exists` over its shingle array)
    * and only CANDIDATE docs explode into the stream-static verify
    * join and the per-doc overlap count. That count is the one
    * stateful op — a watermark-finalized streaming aggregation keyed
    * (ts, id) whose state holds candidate docs only, which is the
    * prefilter's point: state scales with CONTAMINATED throughput, not
    * total throughput. Append mode: a doc's row finalizes when the
    * watermark passes its ts (the windowed-twin contract). Bloom false
    * positives cost a wasted explode but contribute zero joined rows,
    * so emitted counts are exactly the batch scan's — batch-parity is
    * property-tested in StreamingMultimodalSpec.
    *
    * `docs` needs (ts, idCol, textCol); `benchSets` is the
    * `Dedup.shingleSets` shape (`__sh` array column). Output:
    * (ts, idCol, n_overlap) — one row per contaminated doc. */
  def deconStream(docs: DataFrame, benchSets: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3,
      expectedItems: Long = 100000L, fpp: Double = 0.01,
      watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.{CorpusOps, Dedup}
    // static side materialized once at plan build: the Bloom build and
    // every micro-batch's verify join read the checkpointed distinct
    // instead of re-running the bench explode+distinct
    val benchSh = benchSets.select(explode(col("__sh")).as("__sh"))
      .distinct().localCheckpoint()
    val probe = CorpusOps.shingleBloomProbe(benchSh, expectedItems, fpp)
    docs.withWatermark("ts", watermark)
      .withColumn("__sh", Dedup.shingles(col(textCol), shingleSize))
      .filter(exists(col("__sh"), probe))
      .select(col("ts"), col(idCol), explode(col("__sh")).as("__sh"))
      .join(benchSh, Seq("__sh"))
      .groupBy(col("ts"), col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double)
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  final case class CdcChange(key: Long, seq: Long, op: String, value: Double)
  final case class CdcState(seq: Long, op: String, value: Double)
  final case class CdcSnapshot(key: Long, last_seq: Long, value: Double,
      live: Boolean)

  /** Streaming CDC compaction — the streaming twin of
    * [[graft.operators.MergeOps.cdcApply]]: one `mapGroupsWithState`
    * row per key holding the highest-`seq` change seen so far; every
    * micro-batch that touches a key re-emits its current compacted
    * state (update semantics — the downstream sink upserts). The
    * winner is decided by SEQ compare, not arrival order, so
    * out-of-order and cross-batch-straggler changes land exactly where
    * the batch replay would put them (last WRITER wins, not last
    * arriver) — the parity the spec pins. Tombstones stay in state as
    * `live=false` rather than being removed: dropping the state row
    * would forget the delete's seq and let an older straggler
    * resurrect the key. State is one row per key ever touched — the
    * minimal CDC materialization; a production variant ages out
    * tombstones past the replay horizon with an event-time timeout. */
  def cdcCompactStream(changes: Dataset[CdcChange]): Dataset[CdcSnapshot] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .mapGroupsWithState[CdcState, CdcSnapshot](
        GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[CdcChange], state: GroupState[CdcState]) =>
          val incoming = it.maxBy(_.seq)
          val winner = state.getOption match {
            case Some(s) if s.seq > incoming.seq =>
              CdcState(s.seq, s.op, s.value)
            case _ => CdcState(incoming.seq, incoming.op, incoming.value)
          }
          state.update(winner)
          CdcSnapshot(key, winner.seq, winner.value, winner.op != "D")
      }
  }

  final case class MgState(counters: Map[String, Long], n: Long)
  final case class MgTop(key: String, term: String, est: Long,
      n_stream: Long)

  /** Streaming Misra-Gries heavy hitters per key — the streaming twin
    * of [[graft.operators.TextCorpus.misraGries]] (q141): k counters
    * per key held in `mapGroupsWithState`, each micro-batch folded
    * through the sequential MG update (match → increment, room →
    * insert, else decrement-all). Sequential MG across batches is the
    * merge-free case of the mergeable-summaries construction, so the
    * deterministic guarantee survives ANY batch slicing: every term
    * with frequency > ⌊N/(k+1)⌋ is present, and every estimate sits in
    * [exact − ⌊N/(k+1)⌋, exact] — the property the spec pins (MG state
    * is arrival-order-dependent, so state equality with a batch run is
    * NOT the contract; the bound is). Emits the key's full current
    * summary each touched batch (update semantics); state is ≤ k
    * counters per key — bounded forever. */
  def mgHeavyHitterStream(terms: Dataset[(String, String)], k: Int)
      : Dataset[MgTop] = {
    require(k > 0, "k must be positive")
    import terms.sparkSession.implicits._
    terms.groupByKey(_._1)
      .flatMapGroupsWithState[MgState, MgTop](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, String)],
         state: GroupState[MgState]) =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          var n = state.getOption.map(_.n).getOrElse(0L)
          state.getOption.foreach(_.counters.foreach { case (t, c) => m(t) = c })
          it.foreach { case (_, t) =>
            n += 1
            m.get(t) match {
              case Some(c) => m(t) = c + 1
              case None if m.size < k => m(t) = 1L
              case None =>
                val dead = List.newBuilder[String]
                m.foreach { case (key2, c) =>
                  if (c == 1L) dead += key2 else m(key2) = c - 1 }
                dead.result().foreach(m.remove)
            }
          }
          state.update(MgState(m.toMap, n))
          m.iterator.map { case (t, c) => MgTop(key, t, c, n) }
      }
  }

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

  final case class TypedEvent(event_id: Long, user_id: Long,
      event_type: String, ts: java.sql.Timestamp)
  final case class BufEvent(t: Long, id: Long, typ: String, emitted: Boolean)
  final case class DistinctBuf(events: Seq[BufEvent])
  final case class WindowedDistinct(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, n_types: Int)

  /** Streaming twin of the batch windowed-DISTINCT count (q89): for
    * every event, the number of distinct event types this user emitted
    * in the trailing `windowMs` (inclusive both ends — the batch RANGE
    * frame's `[t−W, t]`). A row is emitted only once the watermark
    * STRICTLY passes its event time — from then on no admissible event
    * (t ≥ wm, the conservative reading of the late filter) can land
    * inside its window, so the count is final and batch-equal
    * regardless of batch boundaries or in-watermark disorder.
    *
    * State per user: the events inside the `windowMs + watermark`
    * horizon (emitted rows stay as window MEMBERS until they age past
    * `wm − windowMs`) — bounded regardless of stream length. */
  def windowedDistinctStream(events: Dataset[TypedEvent], windowMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[WindowedDistinct] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DistinctBuf, WindowedDistinct](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[TypedEvent], state: GroupState[DistinctBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          var buf = state.getOption.map(_.events).getOrElse(Seq.empty) ++
            it.map(e => BufEvent(e.ts.getTime, e.event_id, e.event_type,
              emitted = false))
          val out = buf.filter(e => !e.emitted && e.t < wm)
            .sortBy(e => (e.t, e.id))
            .map { e =>
              val n = buf.iterator
                .filter(o => o.t >= e.t - windowMs && o.t <= e.t)
                .map(_.typ).toSet.size
              WindowedDistinct(e.id, uid, new java.sql.Timestamp(e.t), n)
            }
          val emittedIds = out.map(_.event_id).toSet
          buf = buf
            .map(e => if (emittedIds(e.id)) e.copy(emitted = true) else e)
            // members age out once no pending/future event (t ≥ wm)
            // can reach back to them; pending rows are always kept
            .filter(e => !e.emitted || e.t >= wm - windowMs)
          if (buf.isEmpty) state.remove()
          else {
            state.update(DistinctBuf(buf))
            val pending = buf.filter(!_.emitted)
            // wake when the oldest pending row can finalize; with no
            // pending rows, wake when the last member ages out
            val target =
              if (pending.nonEmpty) pending.map(_.t).min
              else buf.map(_.t).max + windowMs
            state.setTimeoutTimestamp(math.max(target, wm) + 1)
          }
          out.iterator
      }
  }

  final case class Transition(user_id: Long, from_type: String,
      to_type: String, ts: java.sql.Timestamp)
  final case class TransEvent(t: Long, id: Long, typ: String)
  final case class TransState(pending: Seq[TransEvent], lastT: Long,
      lastId: Long, lastTyp: String, hasLast: Boolean)

  /** Streaming twin of the batch Markov-transition pairs (q122): per
    * user, one append row per consecutive event pair (prev_type →
    * type) in (time, event_id) order; downstream counts/normalizes
    * exactly as the batch matrix does. A pair (a, b) is emitted only
    * once the watermark STRICTLY passes b's time: an admissible late
    * event has t ≥ wm > b.t, so nothing can still insert between a
    * and b (the q89 finalization argument applied to adjacency), and
    * the in-watermark buffer is replayed in sorted order, so
    * disordered arrival within the delay is invisible.
    *
    * State per user: the pending events inside the watermark horizon
    * plus ONE finalized last event (the adjacency anchor for the next
    * arrival — O(users) tombstone, like the funnel twin's). */
  def transitionStream(events: Dataset[TypedEvent],
      watermarkDelay: String = "0 seconds"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[TypedEvent], state: GroupState[TransState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(
            TransState(Seq.empty, 0L, 0L, "", hasLast = false))
          val pending = st0.pending ++
            it.map(e => TransEvent(e.ts.getTime, e.event_id, e.event_type))
          val (ready, rest) = pending.partition(_.t < wm)
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var last = st0
          ready.sortBy(e => (e.t, e.id)).foreach { e =>
            if (last.hasLast)
              out += Transition(uid, last.lastTyp, e.typ,
                new java.sql.Timestamp(e.t))
            last = last.copy(lastT = e.t, lastId = e.id, lastTyp = e.typ,
              hasLast = true)
          }
          val next = last.copy(pending = rest)
          if (rest.isEmpty && !next.hasLast) state.remove()
          else {
            state.update(next)
            // wake when the oldest pending pair can finalize; the
            // bare anchor needs no timeout — it only matters when a
            // successor arrives
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(math.max(rest.map(_.t).min, wm) + 1)
          }
          out.iterator
      }
  }

  final case class FunnelEvent(user_id: Long, event_type: String,
      ts: java.sql.Timestamp)
  final case class FunnelState(minView: Long, hasView: Boolean,
      clicks: Seq[Long], emitted: Boolean)
  final case class Conversion(user_id: Long, t_view: java.sql.Timestamp,
      t_click: java.sql.Timestamp)

  /** Streaming twin of the batch two-step funnel (q96): per user, the
    * first `viewType` event and the first `clickType` event at or
    * after it. A conversion row is emitted (append, once per user)
    * when the watermark strictly passes BOTH times — before that a
    * late-but-admissible earlier view could lower `t_view` and widen
    * the eligible-click set, so neither time is final.
    *
    * Boundary vs the batch gate: the batch query also reports
    * viewed-but-never-converted users (null `t_click`); a stream can
    * only prove "never" at end-of-stream, so this twin emits
    * conversions only — the deliberate streaming surface.
    *
    * State per user before conversion: first-view candidate + the
    * click times still able to become the first eligible click (at or
    * after the current first view, or inside the watermark where a
    * future view could still precede them) — bounded by the watermark
    * horizon. After conversion: a 3-field tombstone (O(converted
    * users), the batch output's own cardinality). */
  def funnelStream(events: Dataset[FunnelEvent],
      viewType: String = "view", clickType: String = "click",
      watermarkDelay: String = "0 seconds"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .withWatermark("ts", watermarkDelay)
      .filter(col("event_type").isin(viewType, clickType))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption
            .getOrElse(FunnelState(Long.MaxValue, hasView = false,
              Seq.empty, emitted = false))
          if (st.emitted) Iterator.empty
          else {
            val evs = it.toSeq
            val minView = (evs.filter(_.event_type == viewType)
              .map(_.ts.getTime) ++ (if (st.hasView) Seq(st.minView) else Nil))
              .minOption
            // a click stays live while it could yet be the first
            // eligible one: at/after the current first view, or not yet
            // below the watermark (an admissible future view at t ≥ wm
            // could still precede it)
            val clicks = (st.clicks ++ evs.filter(_.event_type == clickType)
              .map(_.ts.getTime))
              .filter(c => minView.exists(c >= _) || c >= wm)
            val tClick = minView.flatMap(v => clicks.filter(_ >= v).minOption)
            if (minView.exists(_ < wm) && tClick.exists(_ < wm)) {
              state.update(FunnelState(minView.get, hasView = true,
                Seq.empty, emitted = true))
              Iterator.single(Conversion(uid,
                new java.sql.Timestamp(minView.get),
                new java.sql.Timestamp(tClick.get)))
            } else {
              state.update(FunnelState(minView.getOrElse(Long.MaxValue),
                minView.isDefined, clicks, emitted = false))
              // wake once the candidate pair can finalize
              tClick.foreach(t =>
                state.setTimeoutTimestamp(math.max(t, wm) + 1))
              Iterator.empty
            }
          }
      }
  }

  /** Streaming twin of the batch half-life time-decay (q121,
    * `TimeSeries.timeDecayedSum`) under a FIXED-ANCHOR contract: the
    * batch operator anchors each key's weights at the key's LATEST
    * event — an anchor that MOVES whenever a later event arrives, so
    * no emitted value could ever finalize (one straggler rescales the
    * key's whole history). The streaming contract instead pins the
    * anchor at each tumbling window's END — fixed a priori, not
    * data-dependent — and emits per (key, window): `n_events`,
    * `decayed_sum = Σ value·2^((t−end)/h)` and `freshness` (weights in
    * (2^(−len/h), 1] since end − t < window length).
    *
    * Finalization argument: each row's weight is a pure function of
    * its OWN timestamp and the window's fixed end, so the aggregate is
    * a plain associative windowed sum — in-watermark late arrivals
    * fold in exactly; when the watermark strictly passes the window
    * end, no admissible event can still join the window and the row is
    * final. State = the open (key, window) partial sums inside the
    * watermark horizon (no per-event buffering — contrast
    * [[windowedDistinctStream]], whose per-row outputs need window
    * MEMBERS retained). Batch parity over the same fixed-anchor
    * formula is property-tested on randomized disordered batches. */
  def timeDecayStream(events: DataFrame, keyCol: String, valCol: String,
      halfLifeUs: Long, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    require(halfLifeUs > 0, "halfLifeUs must be positive")
    import graft.functions.MysqlFunctions.oracleRound
    events
      .withWatermark("ts", watermark)
      .withColumn("__win", window(col("ts"), windowLen))
      .withColumn("__w", pow(lit(2.0),
        (unix_micros(col("ts")) - unix_micros(col("__win.end")))
          .cast("double") / lit(halfLifeUs.toDouble)))
      .groupBy(col("__win"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        oracleRound(sum(col(valCol) * col("__w")), 4).as("decayed_sum"),
        oracleRound(sum(col(valCol) * col("__w")) / sum(col(valCol)), 4)
          .as("freshness"))
      .select(col("__win.start").as("bucket"), col(keyCol),
        col("n_events"), col("decayed_sum"), col("freshness"))
  }

  final case class Scd2Run(version: Long, typ: String, fromT: Long,
      n: Long)
  final case class Scd2State(pending: Seq[TransEvent], run: Option[Scd2Run])
  final case class Scd2Version(user_id: Long, version: Long, state: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp,
      n_events: Long)

  /** Streaming twin of the q325 SCD2 build: per user, collapse the
    * event-type stream into maximal runs and emit a VERSION row the
    * moment a run closes — i.e., when the first event of the NEXT run
    * finalizes (watermark strictly past its time, the q89/transition
    * finalization argument: no admissible late event can still land
    * inside the closed run's interval or reorder its boundary). The
    * still-open current run is deliberately NOT emitted — its
    * valid_to is unknowable before end-of-stream — so the streaming
    * surface is "all closed versions", the batch gate's is_current=0
    * rows exactly (the funnel twin's documented boundary, applied to
    * dimension history).
    *
    * State per user: the in-watermark pending buffer (replayed in
    * (t, id) order, so disordered arrival within the delay is
    * invisible and ties collapse identically to the batch total
    * order) plus ONE open-run summary — O(users) once the watermark
    * drains, never per-event. */
  def scd2Stream(events: Dataset[TypedEvent],
      watermarkDelay: String = "0 seconds"): Dataset[Scd2Version] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Version](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[TypedEvent], state: GroupState[Scd2State]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(Scd2State(Seq.empty, None))
          val pending = st0.pending ++
            it.map(e => TransEvent(e.ts.getTime, e.event_id, e.event_type))
          val (ready, rest) = pending.partition(_.t < wm)
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Version]
          var run = st0.run
          ready.sortBy(e => (e.t, e.id)).foreach { e =>
            run = run match {
              case Some(r) if r.typ == e.typ => Some(r.copy(n = r.n + 1))
              case Some(r) =>
                out += Scd2Version(uid, r.version, r.typ,
                  new java.sql.Timestamp(r.fromT),
                  new java.sql.Timestamp(e.t), r.n)
                Some(Scd2Run(r.version + 1, e.typ, e.t, 1L))
              case None => Some(Scd2Run(1L, e.typ, e.t, 1L))
            }
          }
          val next = Scd2State(rest, run)
          if (rest.isEmpty && run.isEmpty) state.remove()
          else {
            state.update(next)
            // wake when the oldest pending event can finalize; a bare
            // open run needs no timeout — it only closes when a
            // different-type successor arrives
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(math.max(rest.map(_.t).min, wm) + 1)
          }
          out.iterator
      }
  }

  final case class CusumState(pending: Map[Long, Long], rn: Long,
      burn: Long, s: Long)
  final case class CusumPoint(day: java.sql.Date, x: Long, s_scaled: Long,
      cusum: Double, alarm: Boolean)

  final case class SprtState(pendN: Map[Long, Long], pendK: Map[Long, Long],
      llr: Long, stopped: Boolean)
  final case class SprtPoint(day: java.sql.Date, n: Long, k: Long,
      llr_micro: Long, verdict: String, stopped: Boolean)

  /** Streaming twin of the q412 Wald SPRT: the sequential test's LLR
    * walk maintained ONLINE over finalized daily (trials, successes)
    * counts — exactly the batch micro-unit arithmetic (the engine's
    * Scala-computed integer literals, [[graft.operators.CoreQueries
    * .SprtLaMicro]] family), so state is three exact longs plus the
    * day buffers. Same day-finalization machine as [[cusumStream]]/
    * [[holtStream]]: a day enters the walk only when the watermark
    * passes its end, in day order; within-watermark disorder is
    * invisible and stream output equals the batch window closed form
    * (SprtStreamSpec, in-order AND shuffled). `stopped` latches — the
    * sequential test's "decision already reached on a prefix day". */
  def sprtStream(events: Dataset[TypedEvent],
      successType: String = "purchase",
      watermarkDelay: String = "0 seconds"): Dataset[SprtPoint] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    import graft.operators.{CoreQueries => C}
    val dayMs = 86400000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[SprtState, SprtPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Int, it: Iterator[TypedEvent], state: GroupState[SprtState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption
            .getOrElse(SprtState(Map.empty, Map.empty, 0L, stopped = false))
          var pendN = st0.pendN
          var pendK = st0.pendK
          it.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, dayMs) * dayMs
            pendN = pendN.updated(d, pendN.getOrElse(d, 0L) + 1L)
            if (e.event_type == successType)
              pendK = pendK.updated(d, pendK.getOrElse(d, 0L) + 1L)
          }
          val (ready, rest) =
            pendN.partition { case (d, _) => d + dayMs <= wm }
          var llr = st0.llr
          var stopped = st0.stopped
          val out = scala.collection.mutable.ArrayBuffer.empty[SprtPoint]
          ready.toSeq.sortBy(_._1).foreach { case (d, n) =>
            val k = pendK.getOrElse(d, 0L)
            llr += k * C.SprtLaMicro + (n - k) * C.SprtLbMicro
            val verdict =
              if (llr >= C.SprtAMicro) "accept_h1"
              else if (llr <= -C.SprtAMicro) "accept_h0"
              else "continue"
            stopped ||= verdict != "continue"
            out += SprtPoint(new java.sql.Date(d), n, k, llr, verdict, stopped)
          }
          pendK = pendK.filter { case (d, _) => rest.contains(d) }
          // (llr = 0, not stopped) IS the initial state — removing it
          // then is semantically a no-op, and anything else must persist
          if (rest.isEmpty && llr == 0L && !stopped) state.remove()
          else {
            state.update(SprtState(rest, pendK, llr, stopped))
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(rest.keys.min + dayMs, wm + 1))
          }
          out.iterator
      }
  }

  final case class HoltState(pending: Map[Long, Long], rn: Long,
      x1: Long, l: Long, b: Long, pow: Long)
  final case class HoltPoint(day: java.sql.Date, x: Long, level: Double,
      trend: Double, forecast_next: Double)

  final case class P95State(pending: Map[Long, Long],
      window: Seq[(Long, Long)])
  final case class P95Point(day: java.sql.Date, x: Long, n_window: Int,
      p95: Long)

  /** Streaming twin of the q422 exact sliding-window P95: over each
    * trailing window of the last `windowDays` FINALIZED daily counts,
    * p95 = the ceil(0.95·n)-th smallest value — the exact order
    * statistic, not a sketch (the window is ≤ `windowDays` values by
    * construction, so the state is bounded regardless of stream
    * length). The rolling window is ORDER-SENSITIVE (each emitted row
    * depends on which days precede it), so the [[cusumStream]]
    * day-finalization machine applies verbatim: per-day counts buffer
    * until the watermark passes the day's end, then replay in day
    * order — append to the trailing window, emit the order statistic.
    * Within-watermark disorder is invisible; stream output equals the
    * batch window rows (P95StreamSpec, in-order AND shuffled). State:
    * the pending map plus ≤ `windowDays` (day, count) pairs; the
    * global single-key contract and its scale note are
    * [[cusumStream]]'s. */
  def slidingP95Stream(events: Dataset[TypedEvent], windowDays: Int = 7,
      watermarkDelay: String = "0 seconds"): Dataset[P95Point] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val dayMs = 86400000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[P95State, P95Point](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Int, it: Iterator[TypedEvent], state: GroupState[P95State]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(P95State(Map.empty, Seq.empty))
          var pending = st0.pending
          it.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, dayMs) * dayMs
            pending = pending.updated(d, pending.getOrElse(d, 0L) + 1L)
          }
          val (ready, rest) =
            pending.partition { case (d, _) => d + dayMs <= wm }
          var window = st0.window
          val out = scala.collection.mutable.ArrayBuffer.empty[P95Point]
          ready.toSeq.sortBy(_._1).foreach { case (d, x) =>
            window = (window :+ (d, x)).takeRight(windowDays)
            val sorted = window.map(_._2).sorted
            val n = sorted.length
            val p95 = sorted(math.ceil(n * 0.95).toInt - 1)
            out += P95Point(new java.sql.Date(d), x, n, p95)
          }
          if (rest.isEmpty && window.isEmpty) state.remove()
          else {
            state.update(P95State(rest, window))
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(rest.keys.min + dayMs, wm + 1))
          }
          out.iterator
      }
  }

  /** Streaming twin of the q408 Holt linear smoother: the coupled
    * level/trend recursion maintained ONLINE over finalized daily
    * counts, exactly the batch arithmetic — integer numerators over
    * 4^t (L_t = 2·4^(t−1)·x + 2L' + 2B', B_t = (L_t − 4L')/2 + 2B'),
    * init level = day 1, trend = day 2 − day 1, emitting the next
    * `steps` days with 4-dp half-away-from-zero rounding. Like
    * [[cusumStream]] the recursion is ORDER-SENSITIVE, so the same
    * day-finalization state machine applies: buffer per-day counts,
    * replay a day only when the watermark passes its end, in day
    * order; within-watermark disorder is invisible and the stream
    * output equals the batch rows (HoltStreamSpec, in-order AND
    * shuffled). State: the pending map plus four longs; the global
    * single-key contract and its scale note are [[cusumStream]]'s. */
  def holtStream(events: Dataset[TypedEvent], steps: Int = 16,
      watermarkDelay: String = "0 seconds"): Dataset[HoltPoint] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val dayMs = 86400000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[HoltState, HoltPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Int, it: Iterator[TypedEvent], state: GroupState[HoltState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption
            .getOrElse(HoltState(Map.empty, 0L, 0L, 0L, 0L, 1L))
          var pending = st0.pending
          it.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, dayMs) * dayMs
            pending = pending.updated(d, pending.getOrElse(d, 0L) + 1L)
          }
          val (ready, rest) =
            pending.partition { case (d, _) => d + dayMs <= wm }
          var rn = st0.rn; var x1 = st0.x1
          var l = st0.l; var b = st0.b; var pow = st0.pow
          val out = scala.collection.mutable.ArrayBuffer.empty[HoltPoint]
          ready.toSeq.sortBy(_._1).foreach { case (d, x) =>
            rn += 1
            if (rn == 1) x1 = x
            else if (rn == 2) { l = x1; b = x - x1 }
            else if (rn <= 2L + steps) {
              val lPrev = l
              pow *= 4
              l = 2 * (pow / 4) * x + 2 * lPrev + 2 * b
              b = (l - 4 * lPrev) / 2 + 2 * b
              def r4(num: Long): Double = {
                val v = num.toDouble / pow
                if (v < 0) -math.floor(-v * 1e4 + 0.5) / 1e4
                else math.floor(v * 1e4 + 0.5) / 1e4
              }
              out += HoltPoint(new java.sql.Date(d), x, r4(l), r4(b),
                r4(l + b))
            }
          }
          if (rest.isEmpty && rn == 0L) state.remove()
          else {
            state.update(HoltState(rest, rn, x1, l, b, pow))
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(rest.keys.min + dayMs, wm + 1))
          }
          out.iterator
      }
  }

  /** Streaming twin of the q399 exact CUSUM: the one-sided drift
    * detector S_k = max(0, S_{k-1} + z_k) maintained ONLINE over
    * finalized daily counts. Unlike the commutative twins (counts,
    * sketches), CUSUM is ORDER-SENSITIVE — a day may only enter the
    * recursion once its count can no longer change — so the state
    * machine buffers per-day counts and replays a day into the
    * recursion exactly when the watermark passes its END (the q89
    * finalization argument: no admissible late event can still land
    * in it), in day order. Within-watermark disorder is therefore
    * invisible: stream output equals the batch recursion on the final
    * daily frame (parity-pinned in CusumStreamSpec, in-order AND
    * shuffled).
    *
    * Same arithmetic contract as the batch gate: reference μ₀ = mean
    * of the first `burnDays` days, slack μ₀/4, alarm at 5·μ₀,
    * everything scaled by 4·burnDays so the state stays exact longs
    * (z·scale = scale·x − 5·A). State: one open-day count per day
    * inside the watermark horizon plus three longs — O(horizon), not
    * O(stream). The detector is a GLOBAL monitor (one logical series),
    * so the group key is constant: one task carries three longs and a
    * days-sized map, the upstream count aggregation is where the
    * parallelism lives. */
  def cusumStream(events: Dataset[TypedEvent], burnDays: Int = 14,
      watermarkDelay: String = "0 seconds"): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    require(burnDays > 0, "burnDays must be positive")
    val dayMs = 86400000L
    val scale = 4L * burnDays
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Int, it: Iterator[TypedEvent], state: GroupState[CusumState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption
            .getOrElse(CusumState(Map.empty, 0L, 0L, 0L))
          var pending = st0.pending
          it.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, dayMs) * dayMs
            pending = pending.updated(d, pending.getOrElse(d, 0L) + 1L)
          }
          val (ready, rest) =
            pending.partition { case (d, _) => d + dayMs <= wm }
          var rn = st0.rn; var burn = st0.burn; var s = st0.s
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumPoint]
          ready.toSeq.sortBy(_._1).foreach { case (d, x) =>
            rn += 1
            if (rn <= burnDays) burn += x
            else {
              s = math.max(0L, s + scale * x - 5L * burn)
              out += CusumPoint(new java.sql.Date(d), x, s,
                math.floor(s.toDouble / scale * 1e4 + 0.5) / 1e4,
                s > burn * 20L)
            }
          }
          if (rest.isEmpty && rn == 0L) state.remove()
          else {
            state.update(CusumState(rest, rn, burn, s))
            if (rest.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(rest.keys.min + dayMs, wm + 1))
          }
          out.iterator
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
