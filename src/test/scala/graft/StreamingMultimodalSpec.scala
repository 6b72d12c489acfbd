package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, UserStat}
import java.sql.Timestamp

case class TsEvent(ts: Timestamp, event_type: String, value: Double)
case class TsDoc(ts: Timestamp, doc_id: Long, text: String)
case class FpDoc(ts: Timestamp, fp: String, doc: String)
case class KeyedEvent(user_id: Long, event_id: Long, ts: Timestamp)

class StreamingMultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming windowed agg matches the batch twin on the same events") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TsEvent]
    input.addData(
      TsEvent(ts(5), "click", 1.0), TsEvent(ts(10), "click", 2.0),
      TsEvent(ts(20), "view", 5.0), TsEvent(ts(40), "click", 3.0))
    val q = EventStreams.windowedAgg(input.toDF(), windowLen = "30 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("winagg")
        .select(col("bucket"), col("event_type"), col("n"), col("total_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val bucket0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val bucket30 = Timestamp.valueOf("2024-01-01 10:30:00")
      assert(got == Set(
        (bucket0, "click", 2L, 3.0),
        (bucket0, "view", 1L, 5.0),
        (bucket30, "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming daily counts feed the shared mean-shift detector; planted shift flagged") {
    implicit val sql = spark.sqlContext
    // 30 days, ~flat then doubled at day 16 — the planted level shift;
    // events arrive shuffled across batches (within-watermark disorder)
    def ev(day: Int, i: Int) = KeyedEvent(i.toLong, i.toLong,
      Timestamp.valueOf(f"2024-01-$day%02d 0${i % 9 + 1}:15:00"))
    val events = (1 to 30).flatMap { d =>
      val n = if (d >= 16) 40 else 20
      (0 until n).map(i => ev(d, i))
    }
    val batchDaily = events.toDF()
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val input = MemoryStream[KeyedEvent]
    val q = EventStreams.dailyCountStream(input.toDF(), watermark = "40 days")
      .writeStream.format("memory").queryName("dailycnt")
      .outputMode("complete").start()
    try {
      scala.util.Random.shuffle(events.toVector).grouped(97).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val streamDaily = spark.table("dailycnt")
      val got = streamDaily.as[(java.sql.Date, Double)].collect().toSet
      val expect = batchDaily.as[(java.sql.Date, Double)].collect().toSet
      assert(got == expect, "stream-maintained daily frame must equal batch")
      // the SHARED detector over the stream-maintained frame
      val flags = graft.operators.CoreQueries
        .meanShiftFromDaily(streamDaily)
        .select("day", "is_shift").as[(java.sql.Date, Boolean)].collect()
      // the 25% two-window rule fires for every day whose post-window
      // straddles the jump enough — a band around day 16, nothing
      // outside it
      val flaggedDays = flags.filter(_._2).map(_._1.toLocalDate.getDayOfMonth)
      assert(flaggedDays.contains(16), "the jump day itself must be flagged")
      assert(flaggedDays.forall(d => d >= 9 && d <= 22),
        s"no flags away from the planted boundary, got ${flaggedDays.toSeq}")
      val detBatch = graft.operators.CoreQueries
        .meanShiftFromDaily(batchDaily)
        .select("day", "is_shift").as[(java.sql.Date, Boolean)].collect().toSet
      assert(flags.toSet == detBatch, "detector parity stream vs batch frame")
    } finally q.stop()
  }

  test("streaming daily counts feed the shared EWMA chart; planted jump alerts") {
    implicit val sql = spark.sqlContext
    // flat 20/day, then a 3x jump on day 21 — above the 25% EWMA
    // deviation gate; disorder across batches as in the mean-shift test
    def ev(day: Int, i: Int) = KeyedEvent(i.toLong, i.toLong,
      Timestamp.valueOf(f"2024-01-$day%02d 0${i % 9 + 1}:15:00"))
    val events = (1 to 28).flatMap { d =>
      val n = if (d >= 21) 60 else 20
      (0 until n).map(i => ev(d, i))
    }
    val input = MemoryStream[KeyedEvent]
    val q = EventStreams.dailyCountStream(input.toDF(), watermark = "40 days")
      .writeStream.format("memory").queryName("dailyewma")
      .outputMode("complete").start()
    try {
      scala.util.Random.shuffle(events.toVector).grouped(89).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val streamDaily = spark.table("dailyewma")
      val flags = graft.operators.CoreQueries.ewmaFromDaily(streamDaily)
        .select("day", "alert").as[(java.sql.Date, Boolean)].collect()
      val alerted = flags.filter(_._2).map(_._1.toLocalDate.getDayOfMonth)
      // warm-up days alert while the truncated EWMA fills (documented
      // contract) and the day after the jump may trail; the invariant
      // is: the jump day fires, and the settled flat stretch never does
      assert(alerted.contains(21), s"jump day must alert, got ${alerted.toSeq}")
      assert(alerted.forall(d => d <= 4 || d >= 21),
        s"no alerts in the settled flat stretch, got ${alerted.toSeq}")
      // parity: the same detector over the batch daily frame
      val batchDaily = events.toDF()
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      val detBatch = graft.operators.CoreQueries.ewmaFromDaily(batchDaily)
        .select("day", "alert").as[(java.sql.Date, Boolean)].collect().toSet
      assert(flags.toSet == detBatch, "EWMA parity stream vs batch frame")
    } finally q.stop()
  }

  test("streaming KMV windowed distinct matches the batch sketch under disorder, k-long state") {
    implicit val sql = spark.sqlContext
    import graft.functions.{TextFunctions => T}
    // 60 users over two days, each user's events arriving OUT of order
    // across batches; k=8 < per-day distinct so the estimator path is
    // live. Hashes ride the md5 closed-form convention.
    def ev(day: Int, minute: Int, uid: Long) = KeyedEvent(uid, uid,
      Timestamp.valueOf(f"2024-01-0$day 10:$minute%02d:00"))
    val events = (0L until 30L).flatMap(u =>
      Seq(ev(1, (u % 50).toInt, u), ev(2, (u % 50).toInt, u + 15)))
    val withHash = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("ts"),
      T.md5Int(concat(lit("kmvu:"), col("user_id").cast("string")), 15)
        .as("__h"))
    // batch reference over the same rows
    val batch = EventStreams.kmvWindowStream(
      withHash(events.toDF()), "__h", k = 8, windowLen = "1 day")
    // the streaming side sees the rows SHUFFLED and split across
    // batches — within-watermark disorder must not change any sketch
    val shuffled = scala.util.Random.shuffle(events.toVector)
    val input = MemoryStream[KeyedEvent]
    val q = EventStreams.kmvWindowStream(withHash(input.toDF()), "__h",
        k = 8, watermark = "2 days", windowLen = "1 day")
      .writeStream.format("memory").queryName("kmvwin")
      .outputMode("complete").start()
    try {
      shuffled.grouped(17).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val got = spark.table("kmvwin")
        .as[(java.sql.Date, Double, Long)].collect().toSet
      val expect = batch.as[(java.sql.Date, Double, Long)].collect().toSet
      assert(got == expect, s"stream/batch sketch divergence: $got vs $expect")
      // estimator path genuinely live and in KMV stderr range
      expect.foreach { case (_, est, _) =>
        assert(est != 30.0 && est > 10 && est < 90,
          s"per-day estimate should be a genuine k=8 estimate near 30: $est")
      }
    } finally q.stop()
  }

  test("streaming HLL windowed distinct matches batch registers under disorder, m-byte state") {
    implicit val sql = spark.sqlContext
    import graft.functions.{TextFunctions => T}
    def ev(day: Int, minute: Int, uid: Long) = KeyedEvent(uid, uid,
      Timestamp.valueOf(f"2024-01-0$day 10:$minute%02d:00"))
    // 500 users/day so p=6 runs the raw-estimate regime, not linear
    val events = (0L until 500L).flatMap(u =>
      Seq(ev(1, (u % 50).toInt, u), ev(2, (u % 50).toInt, u + 250)))
    val withHash = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("ts"),
      T.md5Int(concat(lit("hllu:"), col("user_id").cast("string")), 15)
        .as("__h"))
    val batch = EventStreams.hllWindowStream(
      withHash(events.toDF()), "__h", p = 6, windowLen = "1 day")
    val shuffled = scala.util.Random.shuffle(events.toVector)
    val input = MemoryStream[KeyedEvent]
    val q = EventStreams.hllWindowStream(withHash(input.toDF()), "__h",
        p = 6, watermark = "2 days", windowLen = "1 day")
      .writeStream.format("memory").queryName("hllwin")
      .outputMode("complete").start()
    try {
      shuffled.grouped(97).foreach { g =>
        input.addData(g); q.processAllAvailable()
      }
      val got = spark.table("hllwin")
        .as[(java.sql.Date, Double, Long)].collect().toSet
      val expect = batch.as[(java.sql.Date, Double, Long)].collect().toSet
      assert(got == expect, s"stream/batch register divergence: $got vs $expect")
      // raw-estimate regime, within ~3 sigma of 500 at m=64 (13% stderr)
      expect.foreach { case (_, est, _) =>
        assert(est > 300 && est < 750,
          s"per-day estimate should be near 500: $est")
      }
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the gap, across batches") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[KeyedEvent]
    val views = MemoryStream[KeyedEvent]
    clicks.addData(KeyedEvent(1L, 10L, ts(30)))
    views.addData(
      KeyedEvent(1L, 20L, ts(10)),   // 20 min before — within 30m gap
      KeyedEvent(1L, 21L, ts(45)),   // 15 min after — within
      KeyedEvent(2L, 22L, ts(31)))   // other user — excluded
    val q = EventStreams.intervalJoin(clicks.toDF(), views.toDF(), "user_id")
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second batch: a view just outside the gap never joins
      views.addData(KeyedEvent(1L, 23L, Timestamp.valueOf("2024-01-01 11:05:00")))
      q.processAllAvailable()
      val got = spark.table("ivjoin").select("left_id", "right_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 20L), (10L, 21L)))
    } finally q.stop()
  }

  test("left-outer interval join null-extends an unmatched left only after the watermark proves no partner can arrive") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[KeyedEvent]
    val views = MemoryStream[KeyedEvent]
    val q = EventStreams.intervalJoin(clicks.toDF(), views.toDF(), "user_id",
        gap = "30 minutes", watermark = "10 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("ivouter")
      .outputMode("append").start()
    try {
      clicks.addData(KeyedEvent(1L, 10L, ts(0)))  // will stay unmatched
      clicks.addData(KeyedEvent(2L, 11L, ts(5)))  // will match
      views.addData(KeyedEvent(2L, 20L, ts(10)))
      q.processAllAvailable()
      val matched = spark.table("ivouter")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(matched == Set((11L, Some(20L))),
        s"only the matched pair may emit before the watermark, got $matched")
      // advance both watermarks far past 10:00 + gap + delay
      clicks.addData(KeyedEvent(9L, 90L, Timestamp.valueOf("2024-01-01 12:00:00")))
      views.addData(KeyedEvent(9L, 91L, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      clicks.addData(KeyedEvent(9L, 92L, Timestamp.valueOf("2024-01-01 13:00:00")))
      views.addData(KeyedEvent(9L, 93L, Timestamp.valueOf("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val all = spark.table("ivouter")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(all.contains((10L, None)),
        s"the unmatched left must null-extend once the watermark passes, got $all")
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch banded range join on random disordered streams") {
    import graft.operators.RangeJoin
    implicit val sql = spark.sqlContext
    val rng = new scala.util.Random(47)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def randEvents(idBase: Long, n: Int): Seq[KeyedEvent] =
      Seq.tabulate(n)(i => KeyedEvent(1L + rng.nextInt(3), idBase + i,
        new Timestamp(base + rng.nextInt(120) * 60000L)))
    val lefts = randEvents(100L, 25)
    val rights = randEvents(500L, 25)
    val gapSec = 30L * 60
    // batch reference: the SAME pair semantics via the banded range
    // join (|lt − rt| ≤ gap, equi-key) over epoch seconds
    val lDf = lefts.toDF().select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("lt"))
    val rDf = rights.toDF().select(col("user_id"), col("event_id"),
      col("ts").cast("long").as("rt"))
    val want = RangeJoin.bandedRangeJoin(lDf, rDf, Seq("user_id"),
        "lt", "rt", maxGap = gapSec)
      .select(col("event_id"), col("match.event_id").as("rid"))
      .as[(Long, Long)].collect().toSet
    // streaming twin, fed in random order across random batch splits —
    // everything admissible under a 10h watermark, so the inner join
    // must surface exactly the batch pair set
    val lIn = MemoryStream[KeyedEvent]
    val rIn = MemoryStream[KeyedEvent]
    val q = EventStreams.intervalJoin(lIn.toDF(), rIn.toDF(), "user_id",
        gap = "30 minutes", watermark = "10 hours")
      .writeStream.format("memory").queryName("ivprop")
      .outputMode("append").start()
    try {
      var lRest = rng.shuffle(lefts)
      var rRest = rng.shuffle(rights)
      while (lRest.nonEmpty || rRest.nonEmpty) {
        val (lb, lTail) = lRest.splitAt(math.min(1 + rng.nextInt(8), lRest.size))
        val (rb, rTail) = rRest.splitAt(math.min(1 + rng.nextInt(8), rRest.size))
        if (lb.nonEmpty) lIn.addData(lb: _*)
        if (rb.nonEmpty) rIn.addData(rb: _*)
        q.processAllAvailable()
        lRest = lTail
        rRest = rTail
      }
      val got = spark.table("ivprop").select("left_id", "right_id")
        .as[(Long, Long)].collect().toSet
      assert(got == want,
        s"streaming pairs diverge from the batch range join:\n got ${got.size}" +
          s" pairs, want ${want.size};\n missing ${want -- got}\n extra ${got -- want}")
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence per fingerprint") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[FpDoc]
    input.addData(
      FpDoc(ts(1), "fpA", "first"), FpDoc(ts(2), "fpA", "dup"),
      FpDoc(ts(3), "fpB", "other"))
    val q = EventStreams.dedupStream(input.toDF(), "fp")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup").select("fp", "doc")
        .as[(String, String)].collect().toSet
      assert(got == Set(("fpA", "first"), ("fpB", "other")))
    } finally q.stop()
  }

  test("streaming incremental dedup classifies canonicals against the static reference, batch-parity") {
    implicit val sql = spark.sqlContext
    import graft.operators.Dedup
    // reference corpus (static side) — only its FINGERPRINTS are given
    // to the stream, per the q104 persisted-stage contract
    val refDocs = Seq((100L, "alpha beta gamma"), (101L, "delta epsilon"))
      .toDF("doc_id", "text")
    val refFps = refDocs.select(
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val batch = Seq(
      TsDoc(ts(1), 1L, "Alpha  beta GAMMA"), // normalized dup of ref 100
      TsDoc(ts(2), 2L, "zeta eta"),          // new
      TsDoc(ts(3), 3L, "zeta eta"),          // in-stream dup -> dropped
      TsDoc(ts(4), 4L, "theta iota"))        // new
    val input = MemoryStream[TsDoc]
    input.addData(batch: _*)
    val q = EventStreams.incrementalDedupStream(
        input.toDF(), "doc_id", "text", refFps)
      .writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("incdedup").select("doc_id", "status")
        .as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "dup_of_ref", 2L -> "new", 4L -> "new"),
        s"got $got")
      // parity: the batch path on the same data, restricted to the
      // canonicals the stream emits, classifies identically
      val batchRes = Dedup.dedupAgainstReferenceFps(
          batch.toDF().select(col("doc_id"), col("text")),
          "doc_id", "text", refFps)
        .filter(col("status") =!= "dup_in_batch")
        .select("doc_id", "status").as[(Long, String)].collect().toMap
      assert(batchRes == got)
    } finally q.stop()
  }

  test("streaming incremental dedup under DISORDERED arrival: first-arrival canonical, same groups as batch") {
    implicit val sql = spark.sqlContext
    import graft.operators.Dedup
    // the documented contract: the streaming canonical is the first
    // PROCESSING-ORDER arrival, the batch canonical is min(doc_id) —
    // under disordered arrival the REPRESENTATIVE differs while group
    // membership and classification agree
    val refFps = Seq((100L, "ref text"))
      .toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val input = MemoryStream[TsDoc]
    // doc 3 (the HIGHER id of the dup group) arrives first; doc 1
    // arrives later in a later batch — processing order ≠ id order
    input.addData(TsDoc(ts(3), 3L, "same words here"))
    val q = EventStreams.incrementalDedupStream(
        input.toDF(), "doc_id", "text", refFps)
      .writeStream.format("memory").queryName("incdedupdisord")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData(TsDoc(ts(1), 1L, "same  WORDS here"), // same fp as 3
        TsDoc(ts(2), 2L, "ref TEXT"))                     // dup of ref
      q.processAllAvailable()
      val got = spark.table("incdedupdisord").select("doc_id", "status")
        .as[(Long, String)].collect().toMap
      // first-arrival canonical: 3 (not min-id 1) represents the group
      assert(got == Map(3L -> "new", 2L -> "dup_of_ref"), s"got $got")
      // batch on the same docs keeps min-id 1 — different representative,
      // same group structure (exactly one canonical for the {1,3} group)
      // and same classification of it
      val batchRes = Dedup.dedupAgainstReferenceFps(
          Seq((3L, "same words here"), (1L, "same  WORDS here"),
            (2L, "ref TEXT")).toDF("doc_id", "text"),
          "doc_id", "text", refFps)
        .filter(col("status") =!= "dup_in_batch")
        .select("doc_id", "status").as[(Long, String)].collect().toMap
      assert(batchRes == Map(1L -> "new", 2L -> "dup_of_ref"))
      assert(batchRes.values.toSeq.sorted == got.values.toSeq.sorted,
        "group structure/classification must agree; only the representative differs")
    } finally q.stop()
  }

  test("streaming near-dup against persisted reference stages equals the batch FromStages pairs") {
    implicit val sql = spark.sqlContext
    import graft.operators.Dedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val refDocs = Seq(
      (100L, base),
      (101L, "completely different words nothing shared here at all ok"),
      (102L, base + " lambda"))
      .toDF("doc_id", "text")
    val refSets = Dedup.shingleSets(refDocs, "doc_id", "text", 3)
    val refSigs = Dedup.minHashSigsFromSets(refSets, "doc_id", 64)
    val batch = Seq(
      TsDoc(ts(1), 1L, base),                       // J=1.0 with 100, high with 102
      TsDoc(ts(2), 2L, "unrelated text entirely his own thing indeed"),
      TsDoc(ts(3), 3L, base + " lambda"))           // J=1.0 with 102
    val input = MemoryStream[TsDoc]
    input.addData(batch: _*)
    val q = EventStreams.nearDupStream(
        input.toDF(), "doc_id", "text", refSets, refSigs)
      .writeStream.format("memory").queryName("neardupstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("neardupstream")
        .select("doc_id", "ref_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val expect = Dedup.nearDupAgainstReferenceFromStages(
          Dedup.shingleSets(batch.toDF().select(col("doc_id"), col("text")),
            "doc_id", "text", 3),
          Dedup.minHashSigsFromSets(
            Dedup.shingleSets(batch.toDF().select(col("doc_id"), col("text")),
              "doc_id", "text", 3), "doc_id", 64),
          refSets, refSigs, "doc_id")
        .select(col("inc_id"), col("ref_id"), col("jaccard"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expect, s"stream=$got batch=$expect")
      assert(got.nonEmpty && got.exists(_._1 == 1L) && got.exists(_._1 == 3L))
      assert(!got.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("streaming bloom decontamination equals the batch scan, finalized by the watermark") {
    implicit val sql = spark.sqlContext
    import graft.operators.{CorpusOps, Dedup}
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val benchSets = Dedup.shingleSets(bench, "doc_id", "text", 3)
    val batch = Seq(
      TsDoc(ts(1), 1L, "alpha beta gamma delta zeta"), // 2 shared shingles
      TsDoc(ts(2), 2L, "nothing in common here at all"), // clean
      TsDoc(ts(3), 3L, "x alpha beta gamma y"))        // 1 shared shingle
    val input = MemoryStream[TsDoc]
    input.addData(batch: _*)
    val q = EventStreams.deconStream(
        input.toDF(), benchSets, "doc_id", "text")
      .writeStream.format("memory").queryName("deconstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a far-future CLEAN sentinel advances the watermark so the real
      // docs' aggregation groups finalize (append mode emits nothing
      // for the sentinel itself: the prefilter drops it in-scan)
      input.addData(TsDoc(ts(500), 99L, "sentinel advances the clock"))
      q.processAllAvailable()
      input.addData(TsDoc(ts(600), 98L, "and once more for the tick"))
      q.processAllAvailable()
      val got = spark.table("deconstream").select("doc_id", "n_overlap")
        .as[(Long, Long)].collect().toMap
      val expect = CorpusOps.decontaminateFromSets(
          Dedup.shingleSets(batch.toDF().select(col("doc_id"), col("text")),
            "doc_id", "text", 3),
          benchSets, "doc_id")
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"stream=$got batch=$expect")
      assert(got.keySet == Set(1L, 3L) && !got.contains(2L))
    } finally q.stop()
  }

  test("mapGroupsWithState running user stats accumulate across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("userstats")
      .outputMode("update").start()
    try {
      input.addData(Event(1, 10, "click", 1.0), Event(2, 10, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, 10, "click", 4.0), Event(4, 20, "click", 7.0))
      q.processAllAvailable()
      val last = spark.table("userstats").as[UserStat].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.last }
      assert(last(10L) == UserStat(10L, 3L, 7.0))
      assert(last(20L) == UserStat(20L, 1L, 7.0))
    } finally q.stop()
  }

  test("streaming CDC compaction equals batch cdcApply across out-of-order micro-batches") {
    import graft.streaming.EventStreams.{CdcChange, CdcSnapshot}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[CdcChange]
    val q = EventStreams.cdcCompactStream(input.toDS())
      .writeStream.format("memory").queryName("cdcsnap")
      .outputMode("update").start()
    val batches = Seq(
      // batch 1: keys 1..3 upsert; key 4 tombstone arrives FIRST
      Seq(CdcChange(1, 10, "U", 1.0), CdcChange(2, 10, "U", 2.0),
        CdcChange(3, 10, "U", 3.0), CdcChange(4, 20, "D", 0.0)),
      // batch 2: key 1 newer upsert; key 2 tombstone; key 4's OLDER
      // upsert straggles in — must NOT resurrect (seq 15 < 20)
      Seq(CdcChange(1, 20, "U", 1.5), CdcChange(2, 20, "D", 0.0),
        CdcChange(4, 15, "U", 4.0)),
      // batch 3: key 2 re-insert after delete; key 1 stale straggler
      Seq(CdcChange(2, 30, "U", 2.5), CdcChange(1, 5, "U", 9.9)))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("cdcsnap").as[CdcSnapshot].collect()
        .groupBy(_.key).map { case (k, rows) =>
          k -> rows.maxBy(_.last_seq)
        }
      val live = got.collect { case (k, s) if s.live => k -> s.value }
      // batch replay over the SAME changes
      val log = batches.flatten
        .toDF("user_id", "seq", "op", "value")
      val batch = graft.operators.MergeOps
        .cdcApply(log, Seq("user_id"), Seq("seq"), "op")
        .select("user_id", "value")
        .as[(Long, Double)].collect().toMap
      assert(live == batch,
        s"stream $live must equal batch replay $batch")
      assert(got(4L).live == false, "stale straggler must not resurrect a tombstoned key")
    } finally q.stop()
  }

  test("streaming Misra-Gries keeps the deterministic bound across any batch slicing") {
    import graft.streaming.EventStreams.MgTop
    implicit val sql = spark.sqlContext
    val k = 4
    // skewed stream: 'hot' 40%, 'warm' 25%, tail spread thin — sliced
    // into 3 uneven micro-batches
    val all = Seq.fill(40)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 35).map(i => s"tail${i % 12}")
    val rng = new scala.util.Random(7)
    val shuffled = rng.shuffle(all).map(t => ("g", t))
    val batches = Seq(shuffled.take(20), shuffled.slice(20, 70),
      shuffled.drop(70))
    val input = MemoryStream[(String, String)]
    val q = EventStreams.mgHeavyHitterStream(input.toDS(), k)
      .writeStream.format("memory").queryName("mgstream")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val n = all.size.toLong
      val bound = n / (k + 1)
      val last = spark.table("mgstream").as[MgTop].collect()
        .filter(_.n_stream == n).map(r => r.term -> r.est).toMap
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // every term above the threshold must be present...
      exact.filter(_._2 > bound).keys.foreach { t =>
        assert(last.contains(t), s"heavy hitter $t missing from $last")
      }
      // ...and every estimate within [exact - bound, exact]
      last.foreach { case (t, est) =>
        val ex = exact(t)
        assert(est <= ex && est >= ex - bound,
          s"$t est=$est outside [${ex - bound}, $ex]")
      }
      assert(last.size <= k)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions after the gap") {
    import graft.streaming.EventStreams.{Session, TimedEvent}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TimedEvent]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session for user 1: 10:00-10:05 (3 events)
      input.addData(TimedEvent(1, ts(0)), TimedEvent(1, ts(3)), TimedEvent(1, ts(5)))
      q.processAllAvailable()
      // a much later event advances the watermark past 10:05 + 10min gap
      input.addData(TimedEvent(2, Timestamp.valueOf("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // one more batch so the timeout fires under the advanced watermark
      input.addData(TimedEvent(2, Timestamp.valueOf("2024-01-01 11:01:00")))
      q.processAllAvailable()
      val got = spark.table("sessions").as[Session].collect().toSeq
      assert(got.exists(s => s.user_id == 1 &&
        s.start_ts == ts(0) && s.end_ts == ts(5) && s.n_events == 3),
        s"expected user 1 session 10:00-10:05 x3, got $got")
      // user 2's session is still open (watermark has not passed its gap)
      assert(!got.exists(_.user_id == 2))
    } finally q.stop()
  }

  test("streaming sessionize splits sessions on in-batch gaps (batch-twin semantics)") {
    import graft.streaming.EventStreams.{Session, TimedEvent}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TimedEvent]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("gapsessions")
      .outputMode("append").start()
    try {
      // one micro-batch carrying TWO sessions for user 1 (35-min gap
      // between 10:05 and 10:40) — the first must close immediately,
      // exactly as the batch q54 sessionizer would split them
      input.addData(
        TimedEvent(1, Timestamp.valueOf("2024-01-01 10:00:00")),
        TimedEvent(1, Timestamp.valueOf("2024-01-01 10:05:00")),
        TimedEvent(1, Timestamp.valueOf("2024-01-01 10:40:00")),
        TimedEvent(1, Timestamp.valueOf("2024-01-01 10:41:00")))
      q.processAllAvailable()
      val got = spark.table("gapsessions").as[Session].collect().toSeq
      assert(got == Seq(Session(1L,
        Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:05:00"), 2L)),
        s"expected the first session closed by the in-batch gap, got $got")
    } finally q.stop()
  }

  test("streaming sessionize holds sessions open under the watermark so late events can extend them") {
    import graft.streaming.EventStreams.{Session, TimedEvent}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TimedEvent]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 30 * 60 * 1000,
        watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("latesessions")
      .outputMode("append").start()
    try {
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 10:00:00")),
        TimedEvent(1, Timestamp.valueOf("2024-01-01 10:05:00")))
      q.processAllAvailable()
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // 10:20 is late (watermark is 10:00) but admissible: it must join
      // the FIRST session, which therefore cannot have been emitted yet
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 10:20:00")))
      q.processAllAvailable()
      assert(spark.table("latesessions").isEmpty,
        "no session may finalize before the watermark passes its gap")
      // advance the watermark to 12:00 — both sessions finalize
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val got = spark.table("latesessions").as[Session].collect().toSeq
        .sortBy(_.start_ts.getTime)
      assert(got == Seq(
        Session(1L, Timestamp.valueOf("2024-01-01 10:00:00"),
          Timestamp.valueOf("2024-01-01 10:20:00"), 3L),
        Session(1L, Timestamp.valueOf("2024-01-01 11:00:00"),
          Timestamp.valueOf("2024-01-01 11:00:00"), 1L)),
        s"late event must extend the still-open first session, got $got")
    } finally q.stop()
  }

  test("streaming sessionize watermark boundary: t == wm is dropped by the engine; in-watermark late events still merge") {
    import graft.streaming.EventStreams.{Session, TimedEvent}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TimedEvent]
    // gap 30min, delay 30min. After the 11:00 batch the watermark is
    // 10:30 — exactly [10:00]'s end + gap. Empirically (pinned here)
    // Spark's stateful late filter drops an event AT the watermark
    // (admissibility is t > wm), so finalizing with a strict
    // `end + gap < wm` can never lose a mergeable event: any admitted
    // event has t > wm >= end + gap, i.e. beyond the batch gap rule.
    // The 10:31 event (inside the watermark) must still merge with
    // 11:00; the 10:30 event (at the watermark) is dropped.
    val q = EventStreams.sessionize(input.toDS(), gapMs = 30 * 60 * 1000,
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("boundarysessions")
      .outputMode("append").start()
    try {
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 10:31:00")))
      q.processAllAvailable()
      input.addData(TimedEvent(1, Timestamp.valueOf("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // flush everything
      input.addData(TimedEvent(2, Timestamp.valueOf("2024-01-01 20:00:00")))
      q.processAllAvailable()
      input.addData(TimedEvent(2, Timestamp.valueOf("2024-01-01 20:01:00")))
      q.processAllAvailable()
      val got = spark.table("boundarysessions").as[Session].collect().toSeq
        .filter(_.user_id == 1).sortBy(_.start_ts.getTime)
      assert(got == Seq(
        Session(1L, Timestamp.valueOf("2024-01-01 10:00:00"),
          Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        Session(1L, Timestamp.valueOf("2024-01-01 10:31:00"),
          Timestamp.valueOf("2024-01-01 11:00:00"), 2L)),
        s"10:31 merges late; 10:30 (== wm) is engine-dropped; got $got")
    } finally q.stop()
  }

  test("streaming sessionize equals batch gap-splitting on random batched, disordered streams") {
    import graft.streaming.EventStreams.{Session, TimedEvent}
    implicit val sql = spark.sqlContext
    val rng = new scala.util.Random(31)
    val gapMs = 30L * 60 * 1000
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 30 events over 4 hours for 3 users, delivered in RANDOM order
    // across random batch splits — all admissible under a 10h watermark
    // delay, so streaming must reproduce the batch gap-split exactly
    val events = Seq.fill(30)(TimedEvent(1L + rng.nextInt(3),
      new Timestamp(base + rng.nextInt(4 * 60) * 60000L)))
    def referenceSessions(evs: Seq[TimedEvent]): Set[(Long, Long, Long, Long)] =
      evs.groupBy(_.user_id).flatMap { case (uid, es) =>
        val ts = es.map(_.ts.getTime).sorted
        ts.tail.foldLeft(List((ts.head, ts.head, 1L))) {
          case ((s, e, n) :: rest, t) =>
            if (t - e <= gapMs) (s, math.max(e, t), n + 1) :: rest
            else (t, t, 1L) :: (s, e, n) :: rest
          case (Nil, t) => List((t, t, 1L))
        }.map { case (s, e, n) => (uid, s, e, n) }
      }.toSet
    val input = MemoryStream[TimedEvent]
    val q = EventStreams.sessionize(input.toDS(), gapMs,
        watermarkDelay = "10 hours")
      .writeStream.format("memory").queryName("propsessions")
      .outputMode("append").start()
    try {
      val shuffled = rng.shuffle(events)
      var rest = shuffled
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rng.nextInt(10))
        input.addData(batch: _*)
        q.processAllAvailable()
        rest = tail
      }
      // sentinel advances the watermark far past every real session
      input.addData(TimedEvent(999L, new Timestamp(base + 1000L * 60 * 60000)))
      q.processAllAvailable()
      input.addData(TimedEvent(999L, new Timestamp(base + 1001L * 60 * 60000)))
      q.processAllAvailable()
      val got = spark.table("propsessions").as[Session].collect().toSeq
        .filter(_.user_id != 999L)
        .map(s => (s.user_id, s.start_ts.getTime, s.end_ts.getTime, s.n_events))
        .toSet
      assert(got == referenceSessions(events),
        s"streaming sessions diverge from the batch reference:\n got $got\n " +
          s"want ${referenceSessions(events)}")
    } finally q.stop()
  }

  test("streaming windowed distinct finalizes exact trailing-window type counts") {
    import graft.streaming.EventStreams.{TypedEvent, WindowedDistinct}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.windowedDistinctStream(input.toDS(),
        windowMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("windistinct")
      .outputMode("append").start()
    try {
      input.addData(
        TypedEvent(1L, 1L, "view", ts(0)),
        TypedEvent(2L, 1L, "click", ts(10)),
        TypedEvent(3L, 1L, "view", ts(50)))   // [10:20,10:50] sees only itself
      q.processAllAvailable()
      // sentinel advances the watermark; second batch fires the timeout
      input.addData(TypedEvent(90L, 9L, "view", Timestamp.valueOf("2024-01-01 20:00:00")))
      q.processAllAvailable()
      input.addData(TypedEvent(91L, 9L, "view", Timestamp.valueOf("2024-01-01 20:01:00")))
      q.processAllAvailable()
      val got = spark.table("windistinct").as[WindowedDistinct].collect()
        .filter(_.user_id == 1L).map(e => e.event_id -> e.n_types).toMap
      assert(got == Map(1L -> 1, 2L -> 2, 3L -> 1),
        s"trailing 30m distinct-type counts must match the batch frame, got $got")
    } finally q.stop()
  }

  test("streaming windowed distinct equals the batch RANGE frame on random batched, disordered streams") {
    import graft.streaming.EventStreams.{TypedEvent, WindowedDistinct}
    implicit val sql = spark.sqlContext
    val rng = new scala.util.Random(37)
    val winMs = 30L * 60 * 1000
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = Array("view", "click", "purchase")
    val events = (1 to 40).map(i => TypedEvent(i.toLong, 1L + rng.nextInt(3),
      types(rng.nextInt(3)), new Timestamp(base + rng.nextInt(3 * 60) * 60000L)))
    // the batch q89 semantics: distinct types over same-user events
    // with t' in [t − W, t]
    def reference(evs: Seq[TypedEvent]): Map[Long, Int] =
      evs.map { e =>
        e.event_id -> evs.filter(o => o.user_id == e.user_id &&
          o.ts.getTime >= e.ts.getTime - winMs &&
          o.ts.getTime <= e.ts.getTime).map(_.event_type).distinct.size
      }.toMap
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.windowedDistinctStream(input.toDS(), winMs,
        watermarkDelay = "10 hours")
      .writeStream.format("memory").queryName("windistinctprop")
      .outputMode("append").start()
    try {
      var rest = rng.shuffle(events)
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rng.nextInt(10))
        input.addData(batch: _*)
        q.processAllAvailable()
        rest = tail
      }
      input.addData(TypedEvent(900L, 9L, "view", new Timestamp(base + 1000L * 3600000)))
      q.processAllAvailable()
      input.addData(TypedEvent(901L, 9L, "view", new Timestamp(base + 1001L * 3600000)))
      q.processAllAvailable()
      val got = spark.table("windistinctprop").as[WindowedDistinct].collect()
        .filter(_.user_id != 9L).map(e => e.event_id -> e.n_types).toMap
      assert(got == reference(events),
        s"streaming counts diverge from the batch frame:\n got $got\n want ${reference(events)}")
    } finally q.stop()
  }

  test("streaming transitions equal the batch lag pairs on random batched, disordered streams") {
    import graft.streaming.EventStreams.{Transition, TypedEvent}
    implicit val sql = spark.sqlContext
    val rng = new scala.util.Random(41)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = Array("view", "click", "purchase", "error")
    val events = (1 to 50).map(i => TypedEvent(i.toLong, 1L + rng.nextInt(3),
      types(rng.nextInt(4)), new Timestamp(base + rng.nextInt(3 * 60) * 60000L)))
    // the batch q122 semantics: per-user consecutive pairs in (t, id) order
    def reference(evs: Seq[TypedEvent]): Map[(Long, String, String), Int] =
      evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        es.sortBy(e => (e.ts.getTime, e.event_id)).sliding(2)
          .collect { case Seq(a, b) => (u, a.event_type, b.event_type) }
      }.groupBy(identity).view.mapValues(_.size).toMap
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.transitionStream(input.toDS(),
        watermarkDelay = "10 hours")
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      var rest = rng.shuffle(events)
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rng.nextInt(10))
        input.addData(batch: _*)
        q.processAllAvailable()
        rest = tail
      }
      input.addData(TypedEvent(900L, 9L, "view", new Timestamp(base + 1000L * 3600000)))
      q.processAllAvailable()
      input.addData(TypedEvent(901L, 9L, "view", new Timestamp(base + 1001L * 3600000)))
      q.processAllAvailable()
      val got = spark.table("transitions").as[Transition].collect()
        .filter(_.user_id != 9L)
        .groupBy(t => (t.user_id, t.from_type, t.to_type))
        .view.mapValues(_.length).toMap
      assert(got == reference(events),
        s"streaming transitions diverge from batch lag pairs:\n got $got\n " +
          s"want ${reference(events)}")
    } finally q.stop()
  }

  test("streaming funnel emits first-view/first-eligible-click once both finalize; late earlier view rewrites the pair") {
    import graft.streaming.EventStreams.{Conversion, FunnelEvent}
    implicit val sql = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStream(input.toDS(),
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      // user 1: click BEFORE the first view is ineligible; converts at 10:20
      input.addData(
        FunnelEvent(1L, "click", ts(5)),
        FunnelEvent(1L, "view", ts(10)),
        FunnelEvent(1L, "click", ts(20)),
        // user 2: view then a LATER batch delivers an EARLIER view and a
        // click between them
        FunnelEvent(2L, "view", ts(30)),
        // user 3: click only — never converts
        FunnelEvent(3L, "click", ts(15)))
      q.processAllAvailable()
      // admissible late events under the 2h delay: user 2's true first
      // view at 10:02 and a click at 10:07 (>= 10:02, < 10:30)
      input.addData(
        FunnelEvent(2L, "view", ts(2)),
        FunnelEvent(2L, "click", ts(7)))
      q.processAllAvailable()
      assert(spark.table("funnel").isEmpty,
        "nothing may emit before the watermark passes the candidate pairs")
      input.addData(FunnelEvent(9L, "view", Timestamp.valueOf("2024-01-02 10:00:00")))
      q.processAllAvailable()
      input.addData(FunnelEvent(9L, "view", Timestamp.valueOf("2024-01-02 11:00:00")))
      q.processAllAvailable()
      val got = spark.table("funnel").as[Conversion].collect()
        .map(c => (c.user_id, c.t_view, c.t_click)).toSet
      assert(got == Set(
        (1L, ts(10), ts(20)),
        (2L, ts(2), ts(7))),
        s"conversions must use the final first view and first eligible click, got $got")
    } finally q.stop()
  }

  test("streaming funnel equals the batch first-touch pairs on random batched, disordered streams") {
    import graft.streaming.EventStreams.{Conversion, FunnelEvent}
    implicit val sql = spark.sqlContext
    val rng = new scala.util.Random(41)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = (1 to 60).map { _ =>
      FunnelEvent(1L + rng.nextInt(6),
        if (rng.nextBoolean()) "view" else "click",
        new Timestamp(base + rng.nextInt(4 * 60) * 60000L))
    }
    // batch q96 semantics restricted to converted users
    def reference(evs: Seq[FunnelEvent]): Set[(Long, Long, Long)] =
      evs.groupBy(_.user_id).flatMap { case (uid, es) =>
        val tv = es.filter(_.event_type == "view").map(_.ts.getTime)
          .minOption
        tv.flatMap { v =>
          es.filter(e => e.event_type == "click" && e.ts.getTime >= v)
            .map(_.ts.getTime).minOption.map(c => (uid, v, c))
        }
      }.toSet
    val input = MemoryStream[FunnelEvent]
    val q = EventStreams.funnelStream(input.toDS(),
        watermarkDelay = "10 hours")
      .writeStream.format("memory").queryName("funnelprop")
      .outputMode("append").start()
    try {
      var rest = rng.shuffle(events)
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rng.nextInt(12))
        input.addData(batch: _*)
        q.processAllAvailable()
        rest = tail
      }
      input.addData(FunnelEvent(99L, "view", new Timestamp(base + 1000L * 3600000)))
      q.processAllAvailable()
      input.addData(FunnelEvent(99L, "view", new Timestamp(base + 1001L * 3600000)))
      q.processAllAvailable()
      val got = spark.table("funnelprop").as[Conversion].collect()
        .filter(_.user_id != 99L)
        .map(c => (c.user_id, c.t_view.getTime, c.t_click.getTime)).toSet
      assert(got == reference(events),
        s"streaming conversions diverge:\n got $got\n want ${reference(events)}")
    } finally q.stop()
  }

  test("streaming time-decay equals the batch fixed-anchor formula on random batched, disordered streams") {
    implicit val sql = spark.sqlContext
    val rng = new scala.util.Random(53)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val halfLifeUs = 20L * 60 * 1000000 // 20 min
    val winMs = 60L * 60 * 1000
    // 3 users × ~2.5h of events at random minute offsets
    val events = (1 to 60).map(i => (1L + rng.nextInt(3),
      new Timestamp(base + rng.nextInt(150) * 60000L),
      1.0 + rng.nextInt(5)))
    // batch reference: the SAME fixed-anchor contract — per (user,
    // tumbling hour), weights anchored at the window END (the contract
    // deliberately differs from q121's moving per-key-max anchor — a
    // max anchor could never finalize under late data)
    def reference: Map[(Long, Long), (Long, Double, Double)] =
      events.groupBy { case (u, ts, _) => (u, ts.getTime / winMs) }
        .map { case ((u, w), evs) =>
          val endUs = (w + 1) * winMs * 1000
          val wsum = evs.map { case (_, ts, v) =>
            v * math.pow(2.0, (ts.getTime * 1000 - endUs) / halfLifeUs.toDouble)
          }.sum
          val vsum = evs.map(_._3).sum
          def r4(x: Double) = if (x < 0) -math.floor(-x * 1e4 + 0.5) / 1e4
            else math.floor(x * 1e4 + 0.5) / 1e4
          (u, w * winMs) -> (evs.size.toLong, r4(wsum), r4(wsum / vsum))
        }
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.timeDecayStream(
        input.toDF().toDF("user_id", "ts", "value"),
        "user_id", "value", halfLifeUs,
        windowLen = "1 hour", watermark = "10 hours")
      .writeStream.format("memory").queryName("timedecayprop")
      .outputMode("append").start()
    try {
      var rest = rng.shuffle(events)
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rng.nextInt(12))
        input.addData(batch: _*)
        q.processAllAvailable()
        rest = tail
      }
      // push the watermark far past every window so all rows finalize
      input.addData((9L, new Timestamp(base + 1000L * 3600000), 1.0))
      q.processAllAvailable()
      input.addData((9L, new Timestamp(base + 1001L * 3600000), 1.0))
      q.processAllAvailable()
      // compare keyed on (user, bucket start ms)
      val gotMap = spark.table("timedecayprop")
        .as[(Timestamp, Long, Long, Double, Double)].collect()
        .filter(_._2 != 9L)
        .map { case (b, u, n, d, f) => (u, b.getTime) -> (n, d, f) }.toMap
      val want = reference.map { case ((u, ms), v) => (u, ms) -> v }
      assert(gotMap == want,
        s"streaming time-decay diverges:\n got $gotMap\n want $want")
    } finally q.stop()
  }

  test("multimodal: frame sampling slices exact byte ranges, metadata-only planning agrees") {
    val payload = Array.tabulate[Byte](2500)(i => (i % 120).toByte)
    val df = Seq((1L, payload), (2L, Array.empty[Byte]))
      .toDF("doc_id", "media")
    val frames = df.select(col("doc_id"),
      Multimodal.sampleFrames(col("media"), frameBytes = 1000, stride = 2).as("f"),
      Multimodal.sampledFrameCount(col("media"), 1000, 2).as("n"))
      .as[(Long, Seq[Array[Byte]], Int)].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    // 2500 bytes -> frames of 1000 at offsets 0,1000,2000; stride 2 keeps 0 and 2000
    val (f1, n1) = frames(1L)
    assert(n1 == 2 && f1.length == 2)
    assert(f1(0).toSeq == payload.slice(0, 1000).toSeq)
    assert(f1(1).toSeq == payload.slice(2000, 2500).toSeq) // short tail frame
    val (f2, n2) = frames(2L)
    assert(n2 == 0 && f2.isEmpty)
  }

  test("multimodal: wavMeta parses javax.sound-written WAV files (independent writer)") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // an INDEPENDENT RIFF writer (the JDK's) — if our parser's offsets,
    // endianness or block-align math were wrong, these would not agree
    def jdkWav(rate: Float, channels: Int, nSamples: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](nSamples * channels * 2)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val cases = Seq((8000f, 1, 1), (16000f, 2, 500), (44100f, 2, 44100),
      (22050f, 1, 997))
    val rows = cases.zipWithIndex.map { case ((r, c, n), i) =>
      (i.toLong, jdkWav(r, c, n), r.toInt, c, n.toLong)
    }.toDF("id", "media", "rate", "channels", "n")
    val got = rows.select(col("id"), col("rate"), col("channels"), col("n"),
        Multimodal.wavMeta(col("media")).as("m"))
      .select(col("id"),
        (col("m.channels") === col("channels") &&
         col("m.sample_rate") === col("rate") &&
         col("m.bits") === lit(16) &&
         col("m.n_samples") === col("n")).as("ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(got.values.forall(identity), s"parse disagreed with the JDK writer: $got")
    // and our own writer round-trips through the JDK reader
    val ours = TestSpark.spark.range(1).select(
        Multimodal.wavBytes(lit(22050), lit(2), lit(1234)).as("w"))
      .as[Array[Byte]].head()
    val aff = AudioSystem.getAudioFileFormat(new java.io.ByteArrayInputStream(ours))
    assert(aff.getFormat.getSampleRate == 22050f)
    assert(aff.getFormat.getChannels == 2)
    assert(aff.getFormat.getSampleSizeInBits == 16)
    assert(aff.getFrameLength == 1234)
    // non-WAV payloads decode to NULL, not garbage — including
    // payloads that are INVALID UTF-8 (a JPEG header: decoding these
    // as strings would throw MALFORMED_CHARACTER_CODING on Spark 4,
    // which is why the magics compare as bytes)
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE0.toByte, 0x00, 0x10) ++ "JFIF".getBytes("US-ASCII")
    val nul = Seq((1L, "not a riff file at all".getBytes("UTF-8")),
        (2L, jpeg), (3L, Array[Byte](0x80.toByte, 0xFE.toByte)))
      .toDF("id", "media")
      .select(Multimodal.wavMeta(col("media")).isNull.as("isnull"))
      .as[Boolean].collect()
    assert(nul.forall(identity))
    // the chunk walk handles invalid-UTF-8 payloads the same way
    val nulC = Multimodal.withWavMetaChunked(
        Seq((1L, jpeg)).toDF("id", "media"), "media", "m")
      .select(col("m").isNull.as("isnull")).as[Boolean].head()
    assert(nulC)
  }

  test("multimodal: chunk-walk WAV parser handles non-canonical chunk orders") {
    // build a canonical file with our writer, then splice a LIST/INFO
    // metadata chunk BETWEEN fmt and data — the layout wavMeta's
    // canonical fast path rejects but real encoders emit
    val base = TestSpark.spark.range(1).select(
        Multimodal.wavBytes(lit(44100), lit(2), lit(321)).as("w"))
      .as[Array[Byte]].head()
    val info = "INFOsoft".getBytes("US-ASCII") // 8 bytes of LIST payload
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](8, 0, 0, 0) ++ info // LE32 size = 8
    val spliced = base.slice(0, 36) ++ list ++ base.slice(36, base.length)
    // riff size field is now stale; the chunk walk never reads it
    val rows = Seq((1L, base), (2L, spliced),
      (3L, "garbage".getBytes("UTF-8"))).toDF("id", "media")
    val got = Multimodal.withWavMetaChunked(rows, "media", "m")
      .withColumn("c", Multimodal.wavMeta(col("media")))
      .select(col("id"), col("m.channels"), col("m.sample_rate"),
        col("m.n_samples"), col("m.duration_ms"), col("c").isNull.as("canonNull"))
      .as[(Long, Option[Int], Option[Int], Option[Long], Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // canonical file: chunked == canonical parser
    assert(got(1L) == ((1L, Some(2), Some(44100), Some(321L),
      Some(7.2789), false)))
    // spliced file: canonical parser rejects, chunk walk succeeds
    assert(got(2L) == ((2L, Some(2), Some(44100), Some(321L),
      Some(7.2789), true)))
    // garbage: both NULL
    assert(got(3L)._2.isEmpty && got(3L)._6)
  }

  test("multimodal: wavSignalStats matches a JVM-side decode of the same bytes") {
    import javax.sound.sampled.AudioSystem
    // engine builds non-silent PCM; decode the SAME bytes on the JVM
    // (via the JDK's conformant reader) and recompute peak/RMS
    val rows = TestSpark.spark.range(6).select(col("id"),
      Multimodal.wavBytesPcm(lit(8000), lit(1),
        (pmod(col("id"), lit(37)) + 3).cast("int"), col("id")).as("media"))
    val engine = rows
      .select(col("id"), col("media"),
        Multimodal.wavSignalStats(col("media")).as("s"))
      .select(col("id"), col("media"), col("s.n_samples"),
        col("s.peak"), col("s.rms"))
    val got = engine.as[(Long, Array[Byte], Long, Long, Double)].collect()
    got.foreach { case (id, bytes, n, peak, rms) =>
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = in.readAllBytes()
      val samples = buf.grouped(2).map(p =>
        ((p(1) << 8) | (p(0) & 0xFF)).toShort.toInt).toArray
      assert(samples.length == n, s"id=$id sample count")
      assert(samples.map(math.abs).max.toLong == peak, s"id=$id peak")
      val jvmRms = math.floor(math.sqrt(
        samples.map(s => s.toDouble * s).sum / samples.length) * 1e4 + 0.5) / 1e4
      assert(jvmRms == rms, s"id=$id rms: jvm $jvmRms vs engine $rms")
    }
  }

  test("multimodal: wavDecimatedStats picks exactly every k-th sample; factor 1 == full stats") {
    import javax.sound.sampled.AudioSystem
    val rows = TestSpark.spark.range(5).select(col("id"),
      Multimodal.wavBytesPcm(lit(8000), lit(1),
        (pmod(col("id"), lit(37)) + 5).cast("int"), col("id")).as("media"))
    val got = rows.select(col("id"), col("media"),
        Multimodal.wavDecimatedStats(col("media"), factor = 4).as("d"),
        Multimodal.wavDecimatedStats(col("media"), factor = 1).as("f"),
        Multimodal.wavSignalStats(col("media")).as("s"))
      .select(col("id"), col("media"), col("d.n_out"), col("d.peak"),
        col("d.rms"), col("f.peak"), col("f.rms"), col("s.peak"),
        col("s.rms"))
      .as[(Long, Array[Byte], Long, Long, Double, Long, Double, Long, Double)]
      .collect()
    got.foreach { case (id, bytes, nOut, peak, rms, fPeak, fRms, sPeak, sRms) =>
      // factor 1 must equal the full-signal stats exactly
      assert(fPeak == sPeak && fRms == sRms, s"id=$id identity decimation")
      // independent JVM decode, stride 4
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val all = in.readAllBytes().grouped(2).map(p =>
        ((p(1) << 8) | (p(0) & 0xFF)).toShort.toInt).toArray
      val dec = all.indices.filter(_ % 4 == 0).map(all)
      assert(dec.size.toLong == nOut, s"id=$id n_out")
      assert(dec.map(math.abs).max.toLong == peak, s"id=$id peak")
      val jvmRms = math.floor(math.sqrt(
        dec.map(s => s.toDouble * s).sum / dec.size) * 1e4 + 0.5) / 1e4
      assert(jvmRms == rms, s"id=$id rms")
    }
  }

  test("multimodal: AVI bytes match a hand-assembled reference; parsers discriminate formats") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-assemble the minimal canonical AVI for one parameter set
    def le32(v: Int) = ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    val hand = "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + 68 + 8 + 4) ++
      "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(68) ++ "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(56) ++
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(120) ++ le32(0) ++
      le32(1) ++ le32(0) ++ le32(320) ++ le32(240) ++ new Array[Byte](16) ++
      "LIST".getBytes("US-ASCII") ++ le32(4) ++ "movi".getBytes("US-ASCII")
    val gen = TestSpark.spark.range(1).select(
      Multimodal.aviBytes(lit(320), lit(240), lit(120), lit(33333)).as("b"))
      .as[Array[Byte]].head()
    assert(gen.toSeq == hand.toSeq, "generator must be byte-identical to the spec layout")
    // parse recovers every field; and the WAV parser REJECTS AVI bytes
    // (and vice versa) — the magic checks discriminate RIFF form types
    val both = Seq((1L, gen),
      (2L, TestSpark.spark.range(1).select(Multimodal.wavBytes(
        lit(8000), lit(1), lit(4)).as("b")).as[Array[Byte]].head()))
      .toDF("id", "media")
    val got = both.select(col("id"),
        Multimodal.aviMeta(col("media")).as("a"),
        Multimodal.wavMeta(col("media")).as("w"))
      .select(col("id"), col("a.width"), col("a.n_frames"), col("a.fps"),
        col("a").isNull.as("aNull"), col("w").isNull.as("wNull"))
      .as[(Long, Option[Int], Option[Long], Option[Double], Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2.contains(320) && got(1L)._3.contains(120L) &&
      got(1L)._4.contains(30.0003) && got(1L)._6, s"avi row: ${got(1L)}")
    assert(got(2L)._5 && !got(2L)._6, s"wav row: ${got(2L)}")
  }

  test("multimodal: DIB frame means match an independent JVM-side demux+decode of the same bytes") {
    import java.nio.{ByteBuffer, ByteOrder}
    // engine builds DIB-frame AVIs; an INDEPENDENT plain-Scala RIFF
    // walker demuxes the SAME bytes and recomputes the per-frame
    // channel means (the q134 JDK-reader move — no shared code with
    // the engine's hex-path decoder)
    val rows = TestSpark.spark.range(9).select(col("id"),
      Multimodal.aviBytesDib(
        (pmod(col("id"), lit(4)) + 2).cast("int"),
        (pmod(col("id"), lit(3)) + 2).cast("int"),
        (pmod(col("id"), lit(3)) + 1).cast("int"),
        lit(40000), col("id")).as("media"))
    val dec = Multimodal.withAviFrameMeans(rows, "media", "m")
      .select(col("id"), col("media"), col("m"))
      .as[(Long, Array[Byte], Option[(Int, Int, Long, Double,
        Seq[(Int, Double, Double, Double)])])]
      .collect()
    assert(dec.length == 9 && dec.forall(_._3.isDefined),
      "every generated AVI must parse")
    def le32(b: Array[Byte], off: Int): Int = ByteBuffer
      .wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt()
    dec.foreach { case (id, bytes, Some((w, h, nf, fps, frames))) =>
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ")
      // strf BITMAPINFOHEADER governs the frame layout
      assert(new String(bytes, 164, 4, "US-ASCII") == "strf")
      val bw = le32(bytes, 176); val bh = le32(bytes, 180)
      assert(bw == w && bh == h, s"id=$id strf dims")
      val stride = (bw * 3 + 3) / 4 * 4
      val fsize = stride * bh
      val step = 8 + fsize + fsize % 2
      assert(le32(bytes, 216) == 4 + nf.toInt * step, s"id=$id movi size")
      assert(fps == math.floor(1000000.0 / 40000 * 1e4 + 0.5) / 1e4)
      (0 until nf.toInt).foreach { f =>
        val chunk = 224 + f * step
        assert(new String(bytes, chunk, 4, "US-ASCII") == "00db" &&
          le32(bytes, chunk + 4) == fsize, s"id=$id frame $f chunk")
        def mean(c: Int): Double = {
          val s = (for (r <- 0 until bh; col <- 0 until bw)
            yield (bytes(chunk + 8 + r * stride + col * 3 + c) & 0xFF)
              .toDouble).sum
          math.floor(s / (bw * bh) * 1e4 + 0.5) / 1e4
        }
        val got = frames(f)
        assert(got._1 == f && got._2 == mean(0) && got._3 == mean(1) &&
          got._4 == mean(2), s"id=$id frame $f means: $got")
        // row padding bytes (when stride > 3w) must be zero
        if (stride > bw * 3)
          (0 until bh).foreach(r =>
            (bw * 3 until stride).foreach(p =>
              assert(bytes(chunk + 8 + r * stride + p) == 0)))
      }
    }
    // and the q135 container parser agrees on the shared header fields
    val metas = Multimodal.withAviFrameMeans(rows, "media", "m")
      .select(col("id"), col("m.width"), col("m.n_frames"),
        Multimodal.aviMeta(col("media")).as("a"))
      .select(col("id"), col("width"), col("n_frames"),
        col("a.width"), col("a.n_frames"))
      .as[(Long, Int, Long, Int, Long)].collect()
    metas.foreach { case (id, w1, f1, w2, f2) =>
      assert(w1 == w2 && f1 == f2, s"id=$id: frame decoder vs avih disagree") }
  }

  test("multimodal: interleaved A/V decode matches an independent JVM-side demux of both streams") {
    import java.nio.{ByteBuffer, ByteOrder}
    // engine builds two-stream AVIs; an INDEPENDENT plain-Scala walker
    // demuxes the SAME bytes by the alternating chunk fourccs and
    // recomputes frame means AND audio rms/peak — no shared code with
    // the native decoder
    val rows = TestSpark.spark.range(12).select(col("id"),
      Multimodal.aviBytesInterleaved(
        (pmod(col("id"), lit(4)) + 2).cast("int"),
        (pmod(col("id"), lit(3)) + 2).cast("int"),
        (pmod(col("id"), lit(3)) + 1).cast("int"),
        lit(40000), lit(16000),
        (pmod(col("id"), lit(5)) + 2).cast("int"),
        col("id")).as("media"))
    val dec = Multimodal.withAviAvDecode(rows, "media", "m")
      .select(col("id"), col("media"), col("m"))
      .as[(Long, Array[Byte], Option[(Int, Int, Long, Double, Long,
        Seq[(Int, Double, Double, Double, Long, Double, Long)])])]
      .collect()
    assert(dec.length == 12 && dec.forall(_._3.isDefined),
      "every generated two-stream AVI must parse")
    def le32(b: Array[Byte], off: Int): Int = ByteBuffer
      .wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt()
    def le16s(b: Array[Byte], off: Int): Short = ByteBuffer
      .wrap(b, off, 2).order(ByteOrder.LITTLE_ENDIAN).getShort()
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    dec.foreach { case (id, bytes, Some((w, h, nf, fps, rate, frames))) =>
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ")
      // avih declares two streams; both strl headers present
      assert(le32(bytes, 56 + 0) == 2, s"id=$id stream count")
      assert(new String(bytes, 232, 4, "US-ASCII") == "auds")
      assert(le16s(bytes, 296) == 1 && le16s(bytes, 298) == 1 &&
        le16s(bytes, 310) == 16, s"id=$id PCMWAVEFORMAT")
      assert(rate == 16000 && le32(bytes, 300) == 16000)
      val bw = le32(bytes, 176); val bh = le32(bytes, 180)
      assert(bw == w && bh == h, s"id=$id strf dims")
      val stride = (bw * 3 + 3) / 4 * 4
      val fsize = stride * bh
      val spf = (le32(bytes, 264) / nf).toInt
      val ab = 2 * spf
      val vstep = 8 + fsize + fsize % 2
      val astep = 8 + ab + ab % 2
      assert(bytes.length == 324 + nf.toInt * (vstep + astep), s"id=$id length")
      assert(fps == r4(1000000.0 / 40000))
      (0 until nf.toInt).foreach { f =>
        val voff = 324 + f * (vstep + astep)
        assert(new String(bytes, voff, 4, "US-ASCII") == "00db" &&
          le32(bytes, voff + 4) == fsize, s"id=$id frame $f video chunk")
        def mean(c: Int): Double = r4(
          (for (r <- 0 until bh; col <- 0 until bw)
            yield (bytes(voff + 8 + r * stride + col * 3 + c) & 0xFF)
              .toDouble).sum / (bw * bh))
        val aoff = voff + vstep
        assert(new String(bytes, aoff, 4, "US-ASCII") == "01wb" &&
          le32(bytes, aoff + 4) == ab, s"id=$id frame $f audio chunk")
        val samples = (0 until spf).map(j => le16s(bytes, aoff + 8 + 2 * j).toLong)
        val rms = r4(math.sqrt(samples.map(s => s * s).sum.toDouble / spf))
        val peak = samples.map(math.abs).max
        val got = frames(f)
        assert(got._1 == f && got._2 == mean(0) && got._3 == mean(1) &&
          got._4 == mean(2), s"id=$id frame $f video: $got")
        assert(got._5 == spf && got._6 == rms && got._7 == peak,
          s"id=$id frame $f audio: $got vs ($spf, $rms, $peak)")
      }
    }
    // rejects: a single-stream q140 payload must NOT parse as
    // interleaved (audio strl absent), and vice versa
    val single = TestSpark.spark.range(3).select(col("id"),
      Multimodal.aviBytesDib(lit(2), lit(2), lit(1), lit(40000), col("id"))
        .as("media"))
    val crossA = Multimodal.withAviAvDecode(single, "media", "m")
      .select(col("m").isNull).as[Boolean].collect()
    assert(crossA.forall(identity), "single-stream AVI must not demux as A/V")
    val crossB = Multimodal.withAviFrameMeans(
        rows.select(col("id"), col("media")), "media", "m")
      .select(col("m").isNull).as[Boolean].collect()
    assert(crossB.forall(identity), "two-stream AVI must not parse as single-stream")
  }

  test("multimodal: USTAR shards read by REAL tar; walker round-trips; corruption rejected") {
    import java.nio.file.Files
    import sys.process._
    // doc mix: empty payload, sub-block, exactly-one-block-crossing
    val docs = Seq((0L, "hello world"), (1L, ""), (7L, "x" * 600),
      (12L, "tar shard members"))
    val bytes = docs.toDF("doc_id", "text")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
        .as("members"))
      .select(Multimodal.tarBytes(col("members")).as("t"))
      .as[Array[Byte]].head()
    // REAL tar accepts the archive: listing order and extracted content
    val f = Files.createTempFile("graft_shard", ".tar")
    Files.write(f, bytes)
    val listed = Seq("tar", "-tf", f.toString).!!.trim.split("\n").toSeq
    assert(listed == Seq("0.txt", "1.txt", "7.txt", "12.txt"),
      s"GNU tar must list the members in doc order: $listed")
    // stripLineEnd: sys.process's !! re-joins captured lines with a
    // trailing newline; the payload itself has none
    assert(Seq("tar", "-xOf", f.toString, "7.txt").!!.stripLineEnd == "x" * 600,
      "GNU tar must extract the exact payload")
    // native walker round-trip: counts, sizes, closed-form length, md5s
    val walked = Seq(("s", bytes)).toDF("k", "t")
      .select(Multimodal.tarEntries(col("t")).as("w"))
      .select(col("w.n_entries"), col("w.tar_len"),
        col("w.entries"))
      .as[(Int, Long, Seq[(Int, String, Long, String, Long, String)])].head()
    assert(walked._1 == 4 && walked._2 == bytes.length)
    val expectLen = docs.map(d => 512 * (1 + (d._2.length + 511) / 512)).sum + 1024
    assert(walked._2 == expectLen, "closed-form shard length")
    walked._3.zip(docs).foreach {
      case ((idx, name, size, md5hex, csize, cmd5), (id, text)) =>
        assert(name == s"$id.txt" && size == text.length,
          s"entry $idx: $name/$size")
        val expectMd5 = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
        assert(md5hex == expectMd5, s"entry $idx payload digest")
        // plain members: content view == payload view
        assert(csize == size && cmd5 == md5hex, s"entry $idx content view")
    }
    // corruption: a flipped header byte breaks the checksum -> NULL;
    // a nonzero pad byte breaks the padding contract -> NULL
    def walkOf(b: Array[Byte]) = Seq(("s", b)).toDF("k", "t")
      .select(Multimodal.tarEntries(col("t")).isNull).as[Boolean].head()
    val badHeader = bytes.clone(); badHeader(0) = 'Z'.toByte
    assert(walkOf(badHeader), "checksum-violating header must reject")
    // 7.txt's first pad byte: 0.txt (512 hdr + 512 payload), 1.txt
    // (512 hdr + 0), then 7.txt 512 hdr + 600 payload bytes
    val off7pad = (512 + 512) + (512 + 0) + 512 + 600
    val badPad2 = bytes.clone(); badPad2(off7pad) = 1
    assert(walkOf(badPad2), "nonzero payload padding must reject")

    // GZIP-member twin: real tar + zcat round-trips the content; the
    // walker's content view matches the original text; a flipped
    // payload byte breaks the GZIP CRC -> NULL
    val gzBytes = docs.toDF("doc_id", "text")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
        .as("members"))
      .select(Multimodal.tarBytesGz(col("members")).as("t"))
      .as[Array[Byte]].head()
    val fz = Files.createTempFile("graft_shard_gz", ".tar")
    Files.write(fz, gzBytes)
    assert(Seq("tar", "-tf", fz.toString).!!.trim.split("\n").toSeq ==
      Seq("0.txt.gz", "1.txt.gz", "7.txt.gz", "12.txt.gz"))
    val viaTar = (Seq("tar", "-xOf", fz.toString, "7.txt.gz") #| Seq("zcat")).!!
    assert(viaTar.stripLineEnd == "x" * 600,
      "tar | zcat must recover the original text")
    val gzWalk = Seq(("s", gzBytes)).toDF("k", "t")
      .select(Multimodal.tarEntries(col("t")).as("w"))
      .select(col("w.entries"))
      .as[Seq[(Int, String, Long, String, Long, String)]].head()
    gzWalk.zip(docs).foreach {
      case ((idx, name, size, _, csize, cmd5), (id, text)) =>
        assert(name == s"$id.txt.gz", s"entry $idx name")
        assert(csize == text.length, s"entry $idx inflated size")
        val expectMd5 = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
        assert(cmd5 == expectMd5, s"entry $idx content digest")
    }
    // the 600-byte run must genuinely compress
    assert(gzWalk.find(_._2 == "7.txt.gz").get._3 < 600,
      "repetitive member should deflate below its content size")
    // flip one byte inside the first member's gzip payload (after its
    // 10-byte gzip header, inside the deflate stream)
    val badGz = gzBytes.clone(); badGz(512 + 14) = (badGz(512 + 14) ^ 0x7).toByte
    assert(walkOf(badGz), "GZIP CRC violation must reject")
  }

  test("multimodal: NAMED-member tar (WebDataset pairing) — real tar, adjacency, validation") {
    import java.nio.file.Files
    import sys.process._
    // paired sample members: <key>.txt + <key>.cls, name-sorted so a
    // sample's members are ADJACENT (the WebDataset sequential-read
    // contract q430 stages)
    val members = Seq(("10.cls", "en"), ("10.txt", "hello"),
      ("11.txt", "orphan"), ("12.cls", "fr"), ("12.txt", "monde"))
    val bytes = members.toDF("name", "payload")
      .agg(sort_array(collect_list(struct(col("name"), col("payload"))))
        .as("members"))
      .select(Multimodal.tarBytesNamed(col("members")).as("t"))
      .as[Array[Byte]].head()
    val f = Files.createTempFile("graft_named", ".tar")
    Files.write(f, bytes)
    val listed = Seq("tar", "-tf", f.toString).!!.trim.split("\n").toSeq
    assert(listed == members.map(_._1),
      s"GNU tar must list verbatim names in member order: $listed")
    assert(Seq("tar", "-xOf", f.toString, "12.txt").!!.stripLineEnd == "monde")
    // the walker sees the same names; same-key members are adjacent
    val walked = Seq(("s", bytes)).toDF("k", "t")
      .select(Multimodal.tarEntries(col("t")).as("w"))
      .select(col("w.entries"))
      .as[Seq[(Int, String, Long, String, Long, String)]].head()
    assert(walked.map(_._2) == members.map(_._1))
    val keys = walked.map(_._2.split("\\.")(0))
    assert(keys.distinct.flatMap(k => keys.filter(_ == k)) == keys,
      "same-key members must be adjacent")
    // name validation: over-long and non-ASCII names are rejected
    def buildOf(nm: String): Unit =
      Seq((nm, "x")).toDF("name", "payload")
        .agg(collect_list(struct(col("name"), col("payload"))).as("m"))
        .select(Multimodal.tarBytesNamed(col("m")))
        .collect()
    intercept[Exception](buildOf("a" * 101))
    intercept[Exception](buildOf("naïve.txt"))
  }

  test("multimodal: PPM parse on hand-built bytes, multi-digit dims, rejects") {
    // hand-built 2x1 P6: pixels (0,128,255) and (1,2,3) — means known
    val hand = ("P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 128.toByte, 255.toByte, 1, 2, 3))
    val handDf = Seq((1L, hand),
      (2L, "P5\n2 1\n255\n abc".getBytes("US-ASCII")),   // wrong magic
      (3L, "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](9))) // short
      .toDF("id", "media")
    val got = Multimodal.withPpmMeta(handDf, "media", "m")
      .select(col("id"), col("m.width"), col("m.height"), col("m.maxval"),
        col("m.mean_r"), col("m.mean_g"), col("m.mean_b"),
        col("m").isNull.as("bad"))
      .as[(Long, Option[Int], Option[Int], Option[Int], Option[Double],
        Option[Double], Option[Double], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val ok = got(1L)
    assert(ok._2.contains(2) && ok._3.contains(1) && ok._4.contains(255))
    assert(ok._5.contains(0.5) && ok._6.contains(65.0) && ok._7.contains(129.0),
      s"channel means: $ok")
    assert(got(2L)._8 && got(3L)._8, "bad magic / short payload must be NULL")
    // generator round-trip at multi-digit dims (width 12 = 2-digit parse)
    val gen = TestSpark.spark.range(1).select(col("id"),
      Multimodal.ppmBytes(lit(12), lit(3), col("id")).as("media"))
    val g = Multimodal.withPpmMeta(gen, "media", "m")
      .select(col("m.width"), col("m.height"), col("m.n_pixels"))
      .as[(Int, Int, Long)].head()
    assert(g == ((12, 3, 36L)), s"got $g")
  }

  test("multimodal: wavBytesChunked round-trips through the walk, never the canonical parser") {
    import org.apache.spark.sql.functions.pmod
    // doc-varying junk length (1..5 covers odd -> pad-to-even) and
    // position (every 3rd file junk-first)
    val rows = TestSpark.spark.range(12).select(
      col("id"),
      Multimodal.wavBytesChunked(lit(16000), lit(2),
        (col("id") + 1).cast("int"),
        pmod(col("id"), lit(5L)) + 1, pmod(col("id"), lit(3)) === 0)
        .as("media"))
    val got = Multimodal.withWavMetaChunked(rows, "media", "m")
      .select(col("id"), col("m.channels"), col("m.sample_rate"),
        col("m.n_samples"),
        Multimodal.wavMeta(col("media")).isNull.as("canonNull"))
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(got.length == 12)
    got.foreach { case (id, ch, rate, n, canonNull) =>
      assert(ch == 2 && rate == 16000 && n == id + 1,
        s"walk mis-parsed id=$id: ($ch, $rate, $n)")
      assert(canonNull, s"canonical parser unexpectedly accepted id=$id")
    }
    // the JDK's WAV reader — an independent conformant consumer — still
    // accepts both non-canonical layouts (it walks chunks too)
    import javax.sound.sampled.AudioSystem
    for (junkFirst <- Seq(true, false)) {
      val bytes = TestSpark.spark.range(1).select(
          Multimodal.wavBytesChunked(lit(22050), lit(1), lit(77),
            lit(9L), lit(junkFirst)).as("w"))
        .as[Array[Byte]].head()
      val aff = AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(aff.getFormat.getSampleRate == 22050f, s"junkFirst=$junkFirst")
      assert(aff.getFormat.getChannels == 1)
      assert(aff.getFrameLength == 77, s"junkFirst=$junkFirst")
    }
  }

  test("multimodal: stub decode is deterministic and bounded; resize preserves aspect") {
    val df = Seq((1L, "payload-bytes".getBytes("UTF-8"))).toDF("doc_id", "media")
    val meta = df.select(Multimodal.fakeDecodeMeta(col("media")).as("m"))
      .select("m.width", "m.height", "m.channels")
      .as[(Int, Int, Int)].head()
    assert(meta._1 >= 16 && meta._1 < 1936)
    assert(meta._2 >= 16 && meta._2 < 1096)
    assert(meta._3 >= 1 && meta._3 <= 3)
    val dims = df.select(Multimodal.resizeDims(lit(1920), lit(1080), 960).as("d"))
      .select("d.width", "d.height").as[(Int, Int)].head()
    assert(dims == ((960, 540)))
  }
}
