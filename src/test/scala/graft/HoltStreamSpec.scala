package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.TypedEvent
import java.sql.Timestamp

/** Streaming Holt twin: the day-finalized online level/trend recursion
  * must equal the batch integer-numerator math (q408's) on the same
  * counts, for in-order AND disordered arrival within the watermark
  * delay. */
class HoltStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dayMs = 86400000L
  private def ts(day: Int, minute: Int): Timestamp =
    new Timestamp((day + 1) * dayMs + minute * 60000L)

  /** 12 days: 2 init days then a rising-with-dips tail. */
  private val counts =
    Seq(6, 8, 9, 7, 11, 12, 10, 14, 15, 13, 17, 18).zipWithIndex.map {
      case (n, d) => d -> n
    }

  private def eventsFor(counts: Seq[(Int, Int)]): Seq[TypedEvent] =
    counts.flatMap { case (d, n) =>
      (0 until n).map(i => TypedEvent(d * 100L + i, 1L, "click", ts(d, i)))
    }

  /** The batch recursion (q408 semantics). */
  private def direct(xs: Seq[Int], steps: Int) = {
    var l = xs(0).toLong
    var b = (xs(1) - xs(0)).toLong
    var pow = 1L
    xs.drop(2).take(steps).map { xi =>
      val x = xi.toLong
      val lPrev = l
      pow *= 4
      l = 2 * (pow / 4) * x + 2 * lPrev + 2 * b
      b = (l - 4 * lPrev) / 2 + 2 * b
      def r4(num: Long): Double = {
        val v = num.toDouble / pow
        if (v < 0) -math.floor(-v * 1e4 + 0.5) / 1e4
        else math.floor(v * 1e4 + 0.5) / 1e4
      }
      (x, r4(l), r4(b), r4(l + b))
    }
  }

  private def runStream(evs: Seq[Seq[TypedEvent]], delay: String,
      name: String): Seq[(Long, Double, Double, Double)] = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = EventStreams.holtStream(input.toDS(), steps = 16,
        watermarkDelay = delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.foreach { batch => input.addData(batch); q.processAllAvailable() }
      input.addData(TypedEvent(9999L, 1L, "flush", ts(40, 0)))
      q.processAllAvailable()
      spark.table(name)
        .orderBy("day")
        .select("x", "level", "trend", "forecast_next")
        .as[(Long, Double, Double, Double)].collect().toSeq
    } finally q.stop()
  }

  test("in-order arrival matches the batch recursion exactly") {
    val got = runStream(Seq(eventsFor(counts)), "0 seconds", "holt_inorder")
    assert(got == direct(counts.map(_._2), 16))
  }

  test("disordered arrival within the delay is invisible") {
    val batches = counts.grouped(3).toSeq.map(chunk =>
      eventsFor(chunk).sortBy(e => (e.event_id * 2654435761L) % 97))
    val got = runStream(batches, "3 days", "holt_disorder")
    val want = direct(counts.map(_._2), 16)
    assert(got.take(want.length) == want)
  }

  test("negative-trend rounding matches the batch half-away-from-zero") {
    // a falling series drives the trend negative — the rounding edge
    // the batch gate documents
    val falling = Seq(20, 17, 13, 10, 7, 5, 3, 2).zipWithIndex.map {
      case (n, d) => d -> n
    }
    val got = runStream(Seq(eventsFor(falling)), "0 seconds", "holt_falling")
    val want = direct(falling.map(_._2), 16)
    assert(got == want)
    assert(want.exists(_._3 < 0), "fixture must exercise a negative trend")
  }
}
