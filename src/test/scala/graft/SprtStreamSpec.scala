package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.TypedEvent
import graft.operators.{CoreQueries => C}
import java.sql.Timestamp

/** Streaming SPRT twin: the day-finalized online LLR walk must equal
  * the batch micro-unit window math (q412's) on the same counts, for
  * in-order AND disordered arrival, and `stopped` must latch. */
class SprtStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dayMs = 86400000L
  private def ts(day: Int, minute: Int): Timestamp =
    new Timestamp((day + 1) * dayMs + minute * 60000L)

  /** (trials, successes) per day: starts near p0, drifts above p1 —
    * the walk should cross the H1 bound and latch. */
  private val counts = Seq((40, 7), (45, 8), (50, 9), (40, 11), (44, 12),
    (48, 14), (42, 13), (46, 15), (50, 17), (44, 16))

  private def eventsFor(cs: Seq[((Int, Int), Int)]): Seq[TypedEvent] =
    cs.flatMap { case ((n, k), d) =>
      (0 until n).map { i =>
        val tpe = if (i < k) "purchase" else "view"
        TypedEvent(d * 1000L + i, 1L, tpe, ts(d, i))
      }
    }

  private def direct(cs: Seq[(Int, Int)]) = {
    var llr = 0L
    var stopped = false
    cs.map { case (n, k) =>
      llr += k * C.SprtLaMicro + (n - k) * C.SprtLbMicro
      val verdict =
        if (llr >= C.SprtAMicro) "accept_h1"
        else if (llr <= -C.SprtAMicro) "accept_h0"
        else "continue"
      stopped ||= verdict != "continue"
      (n.toLong, k.toLong, llr, verdict, stopped)
    }
  }

  private def runStream(evs: Seq[Seq[TypedEvent]], delay: String,
      name: String): Seq[(Long, Long, Long, String, Boolean)] = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.sprtStream(input.toDS(), watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.foreach { batch => input.addData(batch); q.processAllAvailable() }
      input.addData(TypedEvent(99999L, 1L, "flush", ts(40, 0)))
      q.processAllAvailable()
      spark.table(name).orderBy("day")
        .select("n", "k", "llr_micro", "verdict", "stopped")
        .as[(Long, Long, Long, String, Boolean)].collect().toSeq
    } finally q.stop()
  }

  test("in-order arrival matches the batch walk; the decision latches") {
    val evs = eventsFor(counts.zipWithIndex)
    val got = runStream(Seq(evs), "0 seconds", "sprt_inorder")
    val want = direct(counts)
    assert(got == want)
    // the fixture is built to decide H1 and stay stopped
    assert(want.exists(_._4 == "accept_h1"))
    val firstStop = want.indexWhere(_._5)
    assert(firstStop >= 0 && want.drop(firstStop).forall(_._5))
  }

  test("disordered arrival within the delay is invisible") {
    val batches = counts.zipWithIndex.grouped(3).toSeq.map(chunk =>
      eventsFor(chunk).sortBy(e => (e.event_id * 2654435761L) % 97))
    val got = runStream(batches, "3 days", "sprt_disorder")
    val want = direct(counts)
    assert(got.take(want.length) == want)
  }
}
