package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.TypedEvent
import java.sql.Timestamp

/** Streaming SCD2 twin: closed-version parity with the q325 batch
  * build, disordered arrival, the open-run boundary. */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** The q325 batch logic on a typed-event frame (ms precision),
    * filtered to closed versions. */
  private def batchClosed(events: Seq[TypedEvent]) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val vw = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    events.toDF()
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("us"), col("event_type").as("state"))
      .withColumn("chg",
        when(lag(col("state"), 1).over(w).isNull ||
          lag(col("state"), 1).over(w) =!= col("state"), 1).otherwise(0))
      .withColumn("version", sum(col("chg")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(first(col("state")).as("state"),
        min(col("us")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(vw))
      .filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("version").cast("long"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
  }

  test("closed versions match the batch build under disordered arrival") {
    implicit val sql = spark.sqlContext
    // user 1: a a b b b a  (3 versions, 2 closed)
    // user 2: c            (1 open version, nothing emitted)
    // same-minute tie on user 1 (events 13/14) pins the id order
    val evs = Seq(
      TypedEvent(11L, 1L, "a", ts(1)), TypedEvent(12L, 1L, "a", ts(2)),
      TypedEvent(13L, 1L, "b", ts(3)), TypedEvent(14L, 1L, "b", ts(3)),
      TypedEvent(15L, 1L, "b", ts(5)), TypedEvent(16L, 1L, "a", ts(6)),
      TypedEvent(21L, 2L, "c", ts(4)))
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.scd2Stream(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("scd2out")
      .outputMode("append").start()
    try {
      // disordered delivery across micro-batches — within the
      // 10-minute watermark delay, so every event stays admissible
      input.addData(evs(4), evs(0), evs(6))
      q.processAllAvailable()
      input.addData(evs(2), evs(1), evs(3), evs(5))
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark past ts(6)
      input.addData(TypedEvent(99L, 9L, "z", ts(50)))
      q.processAllAvailable()
      input.addData(TypedEvent(98L, 9L, "z", ts(55)))
      q.processAllAvailable()
      val got = spark.table("scd2out")
        .select(col("user_id"), col("version"), col("state"),
          unix_millis(col("valid_from")).as("f"),
          unix_millis(col("valid_to")).as("t"), col("n_events"))
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet
      val want = batchClosed(evs)
      assert(got == want, s"stream $got vs batch $want")
      // the boundary: user 1's open 3rd run and user 2's only run are
      // absent; versions 1..2 of user 1 are the full closed set
      assert(got.map(_._1) == Set(1L))
      assert(got.map(_._2) == Set(1L, 2L))
      // the tie pair collapsed into one version-2 run of 3 b's
      assert(got.find(_._2 == 2L).get._6 == 3L)
    } finally q.stop()
  }

  test("run state survives across many micro-batches without re-emission") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2inc")
      .outputMode("append").start()
    try {
      // one event per batch: a a b a  -> closed versions (a,2) (b,1)
      Seq(TypedEvent(1L, 7L, "a", ts(1)), TypedEvent(2L, 7L, "a", ts(2)),
        TypedEvent(3L, 7L, "b", ts(3)), TypedEvent(4L, 7L, "a", ts(4)),
        TypedEvent(9L, 8L, "z", ts(40)), TypedEvent(10L, 8L, "z", ts(45)))
        .foreach { e => input.addData(e); q.processAllAvailable() }
      val got = spark.table("scd2inc")
        .select("user_id", "version", "state", "n_events")
        .as[(Long, Long, String, Long)].collect().filter(_._1 == 7L)
        .sortBy(_._2)
      assert(got.toSeq == Seq((7L, 1L, "a", 2L), (7L, 2L, "b", 1L)))
    } finally q.stop()
  }
}
