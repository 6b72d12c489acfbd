package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.TypedEvent
import java.sql.Timestamp

/** Streaming CUSUM twin: day-finalized online recursion must equal the
  * batch prefix-min closed form (q399's math) on the same counts, for
  * in-order AND disordered arrival within the watermark delay. */
class CusumStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dayMs = 86400000L
  // +1 day: a row at epoch 0 sits ON the initial watermark and Spark's
  // late-row filter drops it — a real edge, avoided in the fixture so
  // the parity math stays readable
  private def ts(day: Int, minute: Int): Timestamp =
    new Timestamp((day + 1) * dayMs + minute * 60000L)

  /** 10 days of counts: 3-day burn-in then a drift from day 6. */
  private val counts =
    Seq(4, 5, 3, 4, 5, 9, 10, 12, 11, 13).zipWithIndex.map {
      case (n, d) => d -> n
    }

  private def eventsFor(counts: Seq[(Int, Int)]): Seq[TypedEvent] =
    counts.flatMap { case (d, n) =>
      (0 until n).map(i => TypedEvent(d * 100L + i, 1L, "click", ts(d, i)))
    }

  /** The batch recursion (q399 semantics, burnDays = 3, scale = 12). */
  private def direct(counts: Seq[Int], burnDays: Int) = {
    val scale = 4L * burnDays
    val a = counts.take(burnDays).map(_.toLong).sum
    var s = 0L
    counts.drop(burnDays).map { x =>
      s = math.max(0L, s + scale * x - 5L * a)
      (x.toLong, s, math.floor(s.toDouble / scale * 1e4 + 0.5) / 1e4,
        s > a * 20L)
    }
  }

  private def runStream(evs: Seq[Seq[TypedEvent]], delay: String,
      name: String): Seq[(Long, Long, Double, Boolean)] = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.cusumStream(input.toDS(), burnDays = 3,
        watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.foreach { batch => input.addData(batch); q.processAllAvailable() }
      // advance the watermark far past the last day so every day closes
      input.addData(TypedEvent(9999L, 1L, "flush", ts(40, 0)))
      q.processAllAvailable()
      spark.table(name)
        .orderBy("day")
        .select("x", "s_scaled", "cusum", "alarm")
        .as[(Long, Long, Double, Boolean)].collect().toSeq
    } finally q.stop()
  }

  test("in-order arrival matches the batch recursion exactly") {
    val got = runStream(Seq(eventsFor(counts)), "0 seconds", "cusum_inorder")
    val want = direct(counts.map(_._2), 3)
    // the flush event's own day (40) never finalizes (the watermark
    // stops AT it), so the output is exactly the post-burn-in days
    assert(got == want.map { case (x, s, c, a) => (x, s, c, a) })
  }

  test("disordered arrival within the delay is invisible") {
    // shuffle WITHIN 3-day chunks delivered in chunk order: every event
    // arrives within the 3-day delay of the max timestamp already seen,
    // so nothing is (correctly) dropped as late and no day finalizes
    // before all of its events arrived
    val batches = counts.grouped(3).toSeq.map(chunk =>
      eventsFor(chunk).sortBy(e => (e.event_id * 2654435761L) % 97))
    val got = runStream(batches, "3 days", "cusum_disorder")
    val want = direct(counts.map(_._2), 3)
    assert(got.take(want.length) == want.map {
      case (x, s, c, a) => (x, s, c, a) })
  }
}
