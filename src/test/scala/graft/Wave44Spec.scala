package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C, PipelineQueries => P}

/** Wave 44 (q410–q412): HITS hubs/authorities, Borda-count fusion,
  * Wald SPRT — each checked against an independent driver-side
  * re-implementation (a hand-rolled HITS power iteration, a Borda
  * point fold over the collected legs, the direct LLR walk). */
class Wave44Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // the engine-wide 6-dp pin (MysqlFunctions.oracleRound), positive x
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q410: engine HITS equals a driver-side max-normalized power iteration") {
    val got = C.hitsPartsSuppliers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // independent replication from the raw pairs
    val pairs = graft.sources.Tables.lineitem(spark, dir)
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = pairs.map(_._2).distinct
    var hub = pairs.map(_._1).distinct.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 0 until 4) {
      val ar = pairs.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => hub(e._1)).sum
      }
      val amx = ar.values.max
      auth = ar.map { case (n, m) => n -> r6(m / amx) }
      val hr = pairs.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => auth(e._2)).sum
      }
      val hmx = hr.values.max
      hub = hr.map { case (n, m) => n -> r6(m / hmx) }
    }
    assert(got.length == hub.size + auth.size)
    got.foreach { case (node, kind, score) =>
      val exp = if (kind == "hub") hub(node) else auth(node)
      // the replication's float SUMS may differ from the engine's by
      // reduction order; the 6-dp pin bounds the drift per round
      assert(math.abs(score - exp) < 5e-6, s"$kind $node: $score vs $exp")
    }
    // max normalization: at least one hub and one auth at exactly 1.0
    assert(got.filter(_._2 == "hub").map(_._3).max == 1.0)
    assert(got.filter(_._2 == "auth").map(_._3).max == 1.0)
    assert(out.toSet == auth.keySet)
  }

  test("q411: Borda scores equal the hand fold over the collected legs") {
    val legs = Seq(P.cosineTopK(spark, dir), P.annTopK(spark, dir),
      P.ivfTopK(spark, dir)).map(
      _.select("query_id", "neighbor_id", "rnk").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap)
    val expected = legs.flatMap(_.keys).distinct.map { key =>
      key -> legs.map(l => l.get(key).map(6L - _).getOrElse(0L)).sum
    }.toMap
    val got = P.bordaFusion(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getInt(3)))
    got.foreach { case (key, score, _) =>
      assert(score == expected(key), s"$key: $score vs ${expected(key)}")
    }
    // per query: ranks 1..3 and scores non-increasing in rank order
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2 >= b._2)
        case _ =>
      }
    }
  }

  test("q412: SPRT walk equals the direct LLR recursion and stops monotonically") {
    // literal sanity: the micro-unit constants are the logs they claim
    assert(C.SprtLaMicro == math.round(math.log(0.22 / 0.18) * 1e6))
    assert(C.SprtLbMicro == math.round(math.log(0.78 / 0.82) * 1e6))
    assert(C.SprtAMicro == math.round(math.log(19.0) * 1e6))
    val rows = C.sprtAudit(spark, dir)
      .collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getBoolean(5)))
    var cum = 0L
    var stopped = false
    rows.foreach { case (_, n, k, llr, verdict, st) =>
      cum += k * C.SprtLaMicro + (n - k) * C.SprtLbMicro
      assert(llr == cum, s"llr $llr vs $cum")
      val expVerdict =
        if (cum >= C.SprtAMicro) "accept_h1"
        else if (cum <= -C.SprtAMicro) "accept_h0"
        else "continue"
      assert(verdict == expVerdict)
      stopped ||= expVerdict != "continue"
      assert(st == stopped)
    }
  }
}
