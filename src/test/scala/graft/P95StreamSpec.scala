package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.TypedEvent
import java.sql.Timestamp

/** Streaming sliding-P95 twin: the day-finalized exact order statistic
  * over the trailing 7-day window must equal the q422 batch window
  * rows on the same counts, for in-order AND disordered arrival. */
class P95StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dayMs = 86400000L
  private def ts(day: Int, minute: Int): Timestamp =
    new Timestamp((day + 1) * dayMs + minute * 60000L)

  /** 12 days with a spike — the window must carry it for 7 days. */
  private val counts =
    Seq(5, 8, 3, 40, 7, 6, 9, 4, 11, 2, 10, 8).zipWithIndex.map {
      case (n, d) => d -> n
    }

  private def eventsFor(cs: Seq[(Int, Int)]): Seq[TypedEvent] =
    cs.flatMap { case (d, n) =>
      (0 until n).map(i => TypedEvent(d * 100L + i, 1L, "click", ts(d, i)))
    }

  /** The q422 batch semantics: trailing ≤7 rows, p95 = the
    * ceil(0.95·n)-th smallest. */
  private def direct(xs: Seq[Int]): Seq[(Long, Int, Long)] =
    xs.indices.map { i =>
      val w = xs.slice(math.max(0, i - 6), i + 1).map(_.toLong).sorted
      (xs(i).toLong, w.length, w(math.ceil(w.length * 0.95).toInt - 1))
    }

  private def runStream(evs: Seq[Seq[TypedEvent]], delay: String,
      name: String): Seq[(Long, Int, Long)] = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.slidingP95Stream(input.toDS(),
        watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.foreach { batch => input.addData(batch); q.processAllAvailable() }
      input.addData(TypedEvent(9999L, 1L, "flush", ts(40, 0)))
      q.processAllAvailable()
      spark.table(name)
        .orderBy("day")
        .select("x", "n_window", "p95")
        .as[(Long, Int, Long)].collect().toSeq
    } finally q.stop()
  }

  test("in-order arrival matches the batch window rows exactly") {
    val got = runStream(Seq(eventsFor(counts)), "0 seconds", "p95_inorder")
    assert(got == direct(counts.map(_._2)))
    // the spike dominates exactly 7 windows (its own + 6 trailing)
    assert(got.count(_._3 == 40L) == 7)
  }

  test("disordered arrival within the delay is invisible") {
    val batches = counts.grouped(3).toSeq.map(chunk =>
      eventsFor(chunk).sortBy(e => (e.event_id * 2654435761L) % 97))
    val got = runStream(batches, "3 days", "p95_disorder")
    val want = direct(counts.map(_._2))
    assert(got.take(want.length) == want)
  }

  test("short windows use the exact small-n order statistic") {
    val tiny = Seq(9, 1, 5).zipWithIndex.map { case (n, d) => d -> n }
    val got = runStream(Seq(eventsFor(tiny)), "0 seconds", "p95_tiny")
    // n=1 -> p95 = the value; n=2 -> ceil(1.9)=2nd smallest = max;
    // n=3 -> ceil(2.85)=3rd smallest = max
    assert(got == Seq((9L, 1, 9L), (1L, 2, 9L), (5L, 3, 9L)))
  }
}
