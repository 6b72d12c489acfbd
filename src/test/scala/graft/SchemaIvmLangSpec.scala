package graft

import org.scalatest.funsuite.AnyFunSuite

/** q375 FK panel, q376 IVM join, q377 langid stability. */
class SchemaIvmLangSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q375 gate frame: TPC-H-shaped data has zero orphans everywhere") {
    val rows = SparkEntry.queries("q375_fk_panel")(spark, dir)
      .select("edge", "n_child", "n_orphan_rows", "n_parents",
        "n_unreferenced", "orphan_rate", "coverage")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 7)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.foreach { case (edge, nc, orph, np, unref, rate, cov) =>
      assert(nc > 0 && np > 0, edge)
      assert(orph == 0 && rate == 0.0, s"$edge has orphans")
      assert(unref >= 0 && unref <= np)
      assert(math.abs(cov - (1.0 - unref.toDouble / np)) < 1e-3)
    }
    // the two nation edges see the same 25-ish parent key space
    val byName = rows.map(r => r._1 -> r).toMap
    assert(byName("customer->nation")._4 ==
      byName("supplier->nation")._4)
  }

  test("q376 gate frame: the delta-join identity holds per segment") {
    val rows = SparkEntry.queries("q376_ivm_join")(spark, dir)
      .select("c_mktsegment", "n_full", "n_ivm", "consistent")
      .as[(String, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, f, i, c) =>
      assert(f == i && c == 1)
      assert(f > 0)
    }
    // segments cover all orders (every order has a customer)
    val nOrders = sources.Tables.orders(spark, dir).count()
    assert(rows.map(_._2).sum == nOrders)
  }

  test("q377 gate frame: fold counts and disagreement bounds") {
    val rows = SparkEntry.queries("q377_langid_stability")(spark, dir)
      .select("lang", "n_docs", "n_unstable", "unstable_rate")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, u, r) =>
      assert(n > 0 && u >= 0 && u <= n)
      assert(math.abs(r - u.toDouble / n) < 1e-3)
    }
    // shared-vocabulary synthetic corpus: halves mostly agree (the
    // en-profile dominates every half), so instability stays partial
    assert(rows.map(_._3).sum < rows.map(_._2).sum)
  }
}
