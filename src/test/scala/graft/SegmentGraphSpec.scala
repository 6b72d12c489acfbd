package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q310 RFM + q311 assortativity: independent recomputes. */
class SegmentGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("q310: scores match a direct tie-sharing quintile recompute") {
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")), col("event_type"),
        round(col("value") * 100).cast("long"))
      .as[(Long, java.sql.Date, String, Long)].collect()
    val mx = rows.map(_._2.toLocalDate).max
    val users = rows.groupBy(_._1).map { case (u, es) =>
      val r = java.time.temporal.ChronoUnit.DAYS.between(
        es.map(_._2.toLocalDate).max, mx)
      val f = es.length.toLong
      val m = es.filter(_._3 == "purchase").map(_._4).sum
      (u, r, f, m)
    }.toSeq
    val n = users.length.toLong
    def score(vals: Seq[Long], v: Long): Long = {
      val cum = vals.count(_ <= v).toLong
      (5 * cum + n - 1) / n
    }
    val out = SparkEntry.queries("q310_rfm_segments")(spark, dir)
      .select("user_id", "r_days", "f_cnt", "m_cents", "r_score",
        "f_score", "m_score", "rfm_cell")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect()
    assert(out.length == users.length)
    val byU = users.map(u => u._1 -> u).toMap
    out.foreach { case (u, r, f, m, rs, fs, ms, cell) =>
      val (_, er, ef, em) = byU(u)
      assert((r, f, m) == ((er, ef, em)), s"user $u metrics")
      assert(rs == 6 - score(users.map(_._2), r), s"user $u r_score")
      assert(fs == score(users.map(_._3), f), s"user $u f_score")
      assert(ms == score(users.map(_._4), m), s"user $u m_score")
      assert(cell == s"$rs$fs$ms")
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
    }
  }

  test("q311: r matches a direct edge-degree Pearson recompute") {
    val pairs = graft.sources.Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_partkey") * 2, col("l_suppkey") * 2 + 1)
      .distinct().as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (p, sp) => Seq((p, sp), (sp, p)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = edges.map(e => deg(e._1))
    val ys = edges.map(e => deg(e._2))
    val m = edges.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(a => a * a).sum
    val r = (m * sxy - sx * sy).toDouble /
      math.sqrt((m * sxx - sx * sx).toDouble * (m * syy - sy * sy).toDouble)
    val got = SparkEntry.queries("q311_assortativity")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(got._1 == deg.size && got._2 == m)
    assert(got._3 == round4(r), s"r ${got._3} vs $r")
    assert(got._3 >= -1.0 && got._3 <= 1.0)
  }
}
