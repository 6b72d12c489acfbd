package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q308 IVM + q309 compaction plan: independent recomputes. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("q308: maintained aggregate equals a from-scratch merge recompute") {
    val base = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    // from-scratch merge (the oracle semantics, re-derived here)
    val merged = base.filter(_._1 % 41 != 0).map { case (k, st, c) =>
      if (k % 37 == 0) (k, "U", c + 1000) else (k, st, c)
    } ++ base.filter(_._1 % 43 == 0).map { case (k, st, c) =>
      (k + 10000000L, st, c)
    }
    val expect = merged.groupBy(_._2).map { case (st, rs) =>
      st -> ((rs.length.toLong, rs.map(_._3).sum))
    }
    val out = SparkEntry.queries("q308_ivm_agg")(spark, dir)
      .select("o_orderstatus", "n_orders", "total_cents")
      .as[(String, Long, Long)].collect()
    assert(out.map(_._1).toSet == expect.keySet)
    out.foreach { case (st, n, c) =>
      assert((n, c) == expect(st), s"$st: ($n,$c) vs ${expect(st)}")
    }
    // the delta path must actually create the 'U' status
    assert(out.exists(_._1 == "U"))
  }

  test("q313: card diff matches per-metric recomputes of both snapshots") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect()
    val snapB = docs.filter(d => d._4 != "src0" && d._5 >= 100)
    val out = SparkEntry.queries("q313_card_diff")(spark, dir)
      .select("metric", "value_a", "value_b", "delta")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 9)
    assert(out("n_docs")._2 == docs.length.toDouble)
    assert(out("n_docs")._3 == snapB.length.toDouble)
    assert(out("n_sources")._3 == snapB.map(_._4).distinct.length.toDouble)
    out.values.foreach { case (m, a, b, d) =>
      assert(d == round4(b - a), s"$m delta")
    }
    // the filter must actually move the card
    assert(out("n_docs")._4 < 0)
  }

  test("q314: estimate and q-error match a direct capped-histogram model") {
    val counts = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect()
    val actual = counts.map(c => c._2 * c._2).sum
    val head = counts.sortBy(c => (-c._2, c._1)).take(100)
    val estHead = head.map(c => c._2 * c._2).sum
    val tailRows = (counts.map(_._2).sum - head.map(_._2).sum).toDouble
    val est = estHead.toDouble +
      tailRows * tailRows / math.max(counts.length - head.length, 1)
    val got = SparkEntry.queries("q314_join_estimate")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == counts.map(_._2).sum && got._2 == counts.length)
    assert(got._3 == actual)
    assert(got._4 == round4(est), s"est ${got._4} vs $est")
    assert(got._5 >= 1.0, "q-error is >= 1 by construction")
  }

  test("q315: percentiles match a direct jittered running-max recompute") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    def md5Int8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val ordered = ev.map { case (id, us) =>
      (id + md5Int8(s"arr:$id") % 200, id, us)
    }.sortBy(e => (e._1, e._2))
    var mx = Long.MinValue
    val lags = ordered.map { case (_, _, us) =>
      val l = if (mx == Long.MinValue) 0L else math.max(mx - us, 0L) / 1000
      mx = math.max(mx, us); l
    }.sorted
    def pct(p: Double): Long = {
      val n = lags.length
      lags.zipWithIndex
        .collectFirst { case (v, i) if (i + 1) * 100 >= n * (p * 100) => v }
        .get
    }
    val got = SparkEntry.queries("q315_disorder_profile")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._1 == ev.length)
    assert(got._2 == pct(0.50) && got._3 == pct(0.95) && got._4 == pct(0.99),
      s"got $got expected (${pct(0.5)}, ${pct(0.95)}, ${pct(0.99)})")
    assert(got._5 == lags.max)
    assert(got._5 > 0, "the planted jitter must produce real disorder")
  }

  test("q309: bins are contiguous, sizes conserved, overflow bounded") {
    val files = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val out = SparkEntry.queries("q309_compaction_plan")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).sum == files.length, "every input assigned once")
    assert(out.map(_._3).sum == files.map(_._2).sum, "bytes conserved")
    // contiguity: each bin's doc range never overlaps the next bin's
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 < b._4, s"bins ${a._1}/${b._1} overlap")
    case _ => ()
    }
    // direct recompute of the assignment rule
    var cum = 0L
    val expect = files.map { case (id, n) =>
      val o = cum / 20000; cum += n; (id, o)
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.foreach { case (o, n, _, _, _, fill) =>
      assert(n == expect(o), s"bin $o: $n vs ${expect(o)}")
      assert(fill > 0)
    }
    // fill bound: a bin ends past its boundary but starts wherever the
    // previous bin's overflow left the cumsum, so every bin except the
    // last holds more than T - max_file_size bytes (and at most
    // T + max_file_size)
    val maxFile = files.map(_._2).max
    out.dropRight(1).foreach { case (o, _, bytes, _, _, _) =>
      assert(bytes > 20000 - maxFile && bytes < 20000 + maxFile,
        s"bin $o out of fill bound: $bytes")
    }
  }
}
