package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries => P}

/** Wave 55 (q464): per-source domain-fit LM delta — driver replay. */
class Wave55Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rnd4(x: Double): Double =
    if (x < 0) -math.floor(-x * 1e4 + 0.5) / 1e4
    else math.floor(x * 1e4 + 0.5) / 1e4
  private def toks(text: String): Array[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  test("q464: own-domain and global scores match a driver replay; delta reads correctly") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2))))
    def model(ds: Seq[(Long, Array[String])]) = {
      val uni = ds.flatMap(_._2).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val cab = ds.flatMap(d => d._2.sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1))))
        .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      (uni, cab, uni.size.toDouble)
    }
    val (gu, gc, gv) = model(docs.map(d => (d._1, d._3)).toSeq)
    val bySource = docs.groupBy(_._2).map { case (s, g) =>
      s -> model(g.map(d => (d._1, d._3)).toSeq)
    }
    def score(ws: Array[String], uni: Map[String, Long],
        cab: Map[(String, String), Long], v: Double): Option[(Long, Double)] = {
      if (ws.length < 2) None
      else {
        val ls = ws.sliding(2).filter(_.length == 2).map { p =>
          math.log10((cab((p(0), p(1))) + 0.5) / (uni(p(0)) + 0.5 * v))
        }.toSeq
        Some((ls.length.toLong, rnd4(ls.sum / ls.length)))
      }
    }
    val got = P.domainLmDelta(spark, dir).collect().map { r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toMap
    var posDelta = 0
    docs.foreach { case (id, src, ws) =>
      val (su, sc, sv) = bySource(src)
      val own = score(ws, su, sc, sv)
      val glob = score(ws, gu, gc, gv)
      val exp = (src, own.map(_._1), own.map(_._2), glob.map(_._2),
        for (a <- own; b <- glob) yield rnd4(a._2 - b._2))
      assert(got(id) == exp, s"at doc $id")
      if (exp._5.exists(_ > 0)) posDelta += 1
    }
    // a doc's own-source model should usually explain it at least as
    // well as the global one (smaller effective vocabulary, its own
    // bigrams included) — the delta's designed reading
    assert(posDelta > docs.length / 2, s"only $posDelta positive deltas")
  }
}
