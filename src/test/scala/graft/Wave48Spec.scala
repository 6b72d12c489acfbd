package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C, PipelineQueries => P}

/** Wave 48 (q423–q425): difference-in-differences, rank-biased
  * precision, and the Qini curve — each replayed on the driver from
  * raw collected rows. */
class Wave48Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  private def r4(x: Double): Double =
    if (x < 0) -math.floor(-x * 1e4 + 0.5) / 1e4
    else math.floor(x * 1e4 + 0.5) / 1e4

  test("q423: DiD equals the four hand-computed group means") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2)))
    val users = ev.map(_._1).distinct
    def treat(u: Long) =
      java.lang.Long.parseLong(md5Hex(s"did:$u").take(8), 16) % 2 == 0
    def purch(u: Long, pre: Boolean) = ev.count(e =>
      e._1 == u && e._3 == "purchase" &&
        (if (pre) e._2 < "2024-01-16" else e._2 >= "2024-01-16")).toLong
    val (t, c) = users.partition(treat)
    def mean(us: Seq[Long], pre: Boolean) =
      us.map(purch(_, pre)).sum.toDouble / us.length
    val did = (mean(t, false) - mean(t, true)) -
      (mean(c, false) - mean(c, true))
    val row = C.didEstimate(spark, dir).collect()(0)
    assert(row.getLong(0) == t.length && row.getLong(1) == c.length)
    assert(row.getDouble(2) == r4(mean(t, true)))
    assert(row.getDouble(3) == r4(mean(t, false)))
    assert(row.getDouble(4) == r4(mean(c, true)))
    assert(row.getDouble(5) == r4(mean(c, false)))
    assert(math.abs(row.getDouble(6) - r4(did)) < 1e-9)
  }

  test("q424: RBP equals the weighted fold over collected legs; weights sum right") {
    // the five weights are (1-p)p^(k-1) at 1e-8 grain; their total is
    // the max possible RBP = 1 - p^5
    assert(math.abs(P.RbpWeightsMicro.sum / 1e8 -
      (1 - math.pow(0.8, 5))) < 1e-7)
    val truth = P.cosineTopK(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = P.ivfTopK(spark, dir)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exp = ivf.groupBy(_._1).map { case (q, rows) =>
      q -> (rows.count(r => truth((r._1, r._2))).toLong,
        rows.filter(r => truth((r._1, r._2)))
          .map(r => P.RbpWeightsMicro(r._3 - 1)).sum)
    }
    val got = P.rbpIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == exp.size)
    got.foreach { case (q, hits, rbp) =>
      val (eh, ewm) = exp(q)
      assert(hits == eh)
      assert(rbp == r4(ewm.toDouble / 1e8), s"query $q")
    }
  }

  test("q425: Qini equals a driver-side decile fold; totals telescope") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      val y = if (rows.exists(_._2 == "purchase")) 1L else 0L
      val t = java.lang.Long.parseLong(md5Hex(s"did:$u").take(8), 16) % 2 == 0
      val s = java.lang.Long.parseLong(md5Hex(s"qini:$u").take(4), 16) / 65536.0
      (u, y, t, s)
    }.toSeq.sortBy(r => (-r._4, r._1))
    val n = users.length
    val base = n / 10
    val extra = n % 10
    val deciles = users.zipWithIndex.map { case (u, i) =>
      // SQL ntile: first `extra` buckets get base+1 rows
      val cut = extra * (base + 1)
      val d = if (i < cut) i / (base + 1) + 1 else (i - cut) / base + extra + 1
      (d, u)
    }
    var (nt, nc, yt, yc) = (0L, 0L, 0L, 0L)
    val exp = (1 to 10).map { d =>
      val rows = deciles.filter(_._1 == d).map(_._2)
      nt += rows.count(_._3); nc += rows.count(!_._3)
      yt += rows.filter(_._3).map(_._2).sum
      yc += rows.filterNot(_._3).map(_._2).sum
      (d, nt, nc, yt, yc, r4(yt.toDouble - yc.toDouble * nt / nc))
    }
    val got = C.qiniCurve(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == exp)
    // final cumulative row covers every user
    assert(got.last._2 + got.last._3 == n)
  }
}
