package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q319 license propagation + q320 temperature mix. */
class LicenseMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("q319: taint propagates through the engine's own dup groups") {
    // ground the component structure in the q49 gate surface (itself
    // oracle-pinned) and recompute the propagation independently
    val groups = SparkEntry.queries("q49_dup_groups")(spark, dir)
      .as[(Long, Long)].collect().toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source").as[(Long, String)].collect()
    def restricted(src: String) = src.drop(3).toInt % 5 == 0
    val comp = docs.map { case (id, _) => id -> groups.getOrElse(id, id) }.toMap
    val tainted = docs.groupBy(d => comp(d._1)).view.mapValues(
      _.exists(d => restricted(d._2))).toMap
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val direct = ds.count(d => restricted(d._2)).toLong
      val inherited = ds.count(d =>
        !restricted(d._2) && tainted(comp(d._1))).toLong
      src -> ((ds.length.toLong, direct, inherited))
    }
    val out = SparkEntry.queries("q319_license_propagation")(spark, dir)
      .select("source", "n_docs", "n_direct", "n_inherited")
      .as[(String, Long, Long, Long)].collect()
    out.foreach { case (src, n, d, i) =>
      assert((n, d, i) == expect(src), s"$src: ($n,$d,$i) vs ${expect(src)}")
    }
    // the sweep must do transitive work at this sf, not just re-label
    assert(out.map(_._4).sum > 0, "some inherited restrictions must exist")
  }

  test("q320: weights match a direct recompute; alpha flattens the mix") {
    val langs = graft.sources.Tables.documents(spark, dir)
      .groupBy("lang").count().as[(String, Long)].collect()
    val n = langs.map(_._2).sum.toDouble
    val out = SparkEntry.queries("q320_temperature_mix")(spark, dir)
      .select("lang", "alpha", "w")
      .as[(String, Double, Double)].collect()
    for (alpha <- Seq(0.2, 0.5, 1.0)) {
      val ps = langs.map { case (l, c) =>
        l -> math.floor(c / n * 1e6 + 0.5) / 1e6
      }
      val z = ps.map(p => math.pow(p._2, alpha)).sum
      ps.foreach { case (l, p) =>
        val got = out.find(r => r._1 == l && r._2 == alpha).get._3
        assert(got == round4(math.pow(p, alpha) / z), s"($l, $alpha)")
      }
      // weights sum to ~1 per alpha
      val s = out.filter(_._2 == alpha).map(_._3).sum
      assert(math.abs(s - 1.0) < 1e-3)
    }
    // flattening: at alpha=0.2 the max weight is closer to uniform
    def spread(a: Double) =
      out.filter(_._2 == a).map(_._3).max - out.filter(_._2 == a).map(_._3).min
    assert(spread(0.2) < spread(1.0), "lower alpha must flatten the mix")
  }
}
