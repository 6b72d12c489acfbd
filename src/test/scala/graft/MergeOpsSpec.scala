package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MergeOps

class MergeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert: updates win by version, inserts pass through, untouched rows survive") {
    val base = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 0))
      .toDF("k", "v", "ver")
    val updates = Seq((2L, "B2", 1), (9L, "new", 1)).toDF("k", "v", "ver")
    val out = MergeOps.upsert(base, updates, Seq("k"), "ver")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))
  }

  test("upsert: chained versions — the highest wins") {
    val base = Seq((1L, "v0", 0)).toDF("k", "v", "ver")
    val updates = Seq((1L, "v1", 1), (1L, "v2", 2)).toDF("k", "v", "ver")
    val out = MergeOps.upsert(base, updates, Seq("k"), "ver")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("v2"))
  }

  test("upsert rejects mismatched schemas") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val upd = Seq((1L, "a", 1)).toDF("k", "v", "ver")
    intercept[IllegalArgumentException] {
      MergeOps.upsert(base, upd, Seq("k"), "ver")
    }
  }

  test("upsert equals the per-key max-version reference on random batches") {
    val rng = new scala.util.Random(61)
    val base = (1L to 50L).map(k => (k, s"base$k", 0))
    val updates = (1L to 50L).filter(_ => rng.nextBoolean()).flatMap { k =>
      (1 to 1 + rng.nextInt(3)).map(v => (k, s"u$k-$v", v))
    }
    val got = MergeOps.upsert(base.toDF("k", "v", "ver"),
        updates.toDF("k", "v", "ver"), Seq("k"), "ver")
      .select("k", "v").as[(Long, String)].collect().toMap
    val want = base.map(r => r._1 -> r._2).toMap ++
      updates.groupBy(_._1).view.mapValues(_.maxBy(_._3)._2).toMap
    assert(got == want)
  }

  test("snapshotDiff classifies insert/delete/update, drops unchanged, null-safe compare") {
    val old = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, None: Option[String], 3.0), (4L, Some("d"), 4.0))
      .toDF("k", "v", "x")
    val nw = Seq((1L, Some("a"), 1.0),            // unchanged -> dropped
      (2L, Some("B"), 2.0),                        // update (value)
      (3L, Some("c"), 3.0),                        // update (null -> value)
      (9L, Some("i"), 9.0))                        // insert; 4 deleted
      .toDF("k", "v", "x")
    val got = MergeOps.snapshotDiff(old, nw, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "update"), (3L, "update"),
      (4L, "delete"), (9L, "insert")))
  }

  test("changeIntervals: runs collapse, valid_to chains to the next run, open run is null") {
    val e = Seq(
      (1L, 1L, "on", 100L), (1L, 2L, "on", 200L), (1L, 3L, "off", 300L),
      (1L, 4L, "on", 400L),
      (2L, 5L, "x", 50L))
      .toDF("user_id", "event_id", "state", "t")
    val out = MergeOps.changeIntervals(e, Seq("user_id"), "t", "state", "event_id")
      .select("user_id", "state", "valid_from", "valid_to", "n_rows")
      .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    assert(out == Set(
      (1L, "on", 100L, Some(300L), 2L),
      (1L, "off", 300L, Some(400L), 1L),
      (1L, "on", 400L, None, 1L),
      (2L, "x", 50L, None, 1L)))
  }

  test("changeIntervals: equal timestamps order by the tie-break, so runs are deterministic") {
    // two events at t=100 with different states: event_id order decides
    // the run sequence (a=first, b=second)
    val e = Seq((1L, 1L, "a", 100L), (1L, 2L, "b", 100L), (1L, 3L, "b", 200L))
      .toDF("user_id", "event_id", "state", "t")
    val out = MergeOps.changeIntervals(e, Seq("user_id"), "t", "state", "event_id")
      .select("state", "valid_from", "valid_to", "n_rows")
      .as[(String, Long, Option[Long], Long)].collect().toSet
    assert(out == Set(("a", 100L, Some(100L), 1L), ("b", 100L, None, 2L)))
  }

  test("cdcApply: last writer wins, trailing tombstone drops the key, re-insert after delete survives") {
    val log = Seq(
      // key 1: plain upsert chain — last value wins
      (1L, 10L, "v1", "U"), (1L, 20L, "v2", "U"),
      // key 2: upsert then tombstone — key vanishes
      (2L, 10L, "x", "U"), (2L, 20L, "x", "D"),
      // key 3: delete then later re-insert — survives with the new value
      (3L, 10L, "old", "D"), (3L, 20L, "back", "U"),
      // key 4: tombstone only — vanishes (no prior state needed)
      (4L, 10L, "", "D"))
      .toDF("k", "seq", "v", "op")
    val out = MergeOps.cdcApply(log, Seq("k"), Seq("seq"), "op")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "v2", 3L -> "back"))
  }

  test("cdcApply: order columns break same-timestamp ties deterministically") {
    val log = Seq(
      (1L, 100L, 1L, "a", "U"), (1L, 100L, 2L, "b", "U"))
      .toDF("k", "ts", "seq", "v", "op")
    val out = MergeOps.cdcApply(log, Seq("k"), Seq("ts", "seq"), "op")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("b"))
  }

  test("goldenRecord: modal name wins, ties break to the smallest, min id + max value survive") {
    val labeled = Seq(
      // cluster 1: "bob" appears twice vs "bobby" once → bob wins
      (1L, 1L, "bobby", 10.0), (1L, 2L, "bob", 5.0), (1L, 3L, "bob", 7.0),
      // cluster 9: 1-1 tie "ann" vs "anne" → lexicographically smaller "ann"
      (9L, 9L, "anne", 1.0), (9L, 11L, "ann", 2.0))
      .toDF("cluster", "id", "name", "bal")
    val got = MergeOps.goldenRecord(labeled, "cluster", "id", "name", "bal")
      .select("rec_id", "n_members", "name", "bal")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got == Set((1L, 3L, "bob", 10.0), (9L, 2L, "ann", 2.0)))
  }

  test("cdcApply rejects missing columns") {
    val log = Seq((1L, 1L, "U")).toDF("k", "seq", "op")
    intercept[IllegalArgumentException] {
      MergeOps.cdcApply(log, Seq("k"), Seq("nope"), "op")
    }
  }
}
