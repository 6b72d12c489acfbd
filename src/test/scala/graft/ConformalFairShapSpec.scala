package graft

import org.scalatest.funsuite.AnyFunSuite

/** q391 conformal, q392 fairness audit, q393 Shapley channels. */
class ConformalFairShapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("q391 gate frame: folds partition and coverage honors the guarantee") {
    val (nTr, nCal, nTe, qh, cov, tgt) =
      SparkEntry.queries("q391_conformal")(spark, dir)
        .select("n_train", "n_cal", "n_test", "qhat_value", "coverage",
          "target")
        .as[(Long, Long, Long, Double, Double, Double)].head()
    val nAll = sources.Tables.events(spark, dir).count()
    assert(nTr + nCal + nTe == nAll)
    assert(qh > 0 && tgt == 0.9)
    // split-conformal marginal coverage: >= target minus sampling
    // slack on ~3k test points
    assert(cov >= 0.85 && cov <= 1.0)
  }

  test("q392 gate frame: rates bounded, overall parity consistent") {
    val rows = SparkEntry.queries("q392_fairness")(spark, dir)
      .select("group", "n_docs", "sel_rate", "tpr", "fpr")
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect()
    val overall = rows.find(_._1 == "__overall").get
    val groups = rows.filter(_._1 != "__overall")
    assert(groups.nonEmpty)
    groups.foreach { case (_, n, sel, tpr, fpr) =>
      assert(n > 0 && sel >= 0.0 && sel <= 1.0)
      tpr.foreach(v => assert(v >= 0.0 && v <= 1.0))
      fpr.foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
    assert(overall._2 == groups.map(_._2).sum)
    val sels = groups.map(_._3)
    assert(math.abs(overall._3 -
      BigDecimal(sels.min / math.max(sels.max, 1e-12))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-3)
  }

  test("q393: the efficiency axiom — phis sum to v(grand) - v(empty)") {
    import org.apache.spark.sql.functions._
    val phis = SparkEntry.queries("q393_shapley")(spark, dir)
      .select("channel", "phi").as[(String, Double)].collect().toMap
    assert(phis.keySet == Set("click", "error", "signup", "view"))
    // recompute v(full mask) and v(0) from the raw events
    val um = sources.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg((max(when(col("event_type") === "click", 1L).otherwise(0L)) +
        max(when(col("event_type") === "error", 2L).otherwise(0L)) +
        max(when(col("event_type") === "signup", 4L).otherwise(0L)) +
        max(when(col("event_type") === "view", 8L).otherwise(0L)))
        .as("m"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    def vOf(mask: Long): Double = {
      val g = um.filter(col("m") === mask)
        .agg(count(lit(1)).as("n"), sum("conv").as("c")).head()
      if (g.getLong(0) == 0) 0.0 else g.getLong(1).toDouble / g.getLong(0)
    }
    val expect = vOf(15L) - vOf(0L)
    assert(math.abs(phis.values.sum - expect) < 5e-3)
  }
}
