package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q345 GK gamma, q346 FD bin design, q347 subsampling table. */
class BinsGammaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q345: gamma is +1 on a perfectly monotone grid, -1 reversed") {
    def gammaOf(cells: Seq[(Long, Long, Long)]): Double = {
      val df = cells.toDF("i", "j", "n")
      val prods = df.select(col("i").as("i1"), col("j").as("j1"),
          col("n").as("n1"))
        .crossJoin(df.select(col("i").as("i2"), col("j").as("j2"),
          col("n").as("n2")))
      val r = prods.agg(
        sum(when(col("i2") > col("i1") && col("j2") > col("j1"),
          col("n1") * col("n2")).otherwise(0L)).as("c"),
        sum(when(col("i2") > col("i1") && col("j2") < col("j1"),
          col("n1") * col("n2")).otherwise(0L)).as("d"))
        .head()
      val (c, d) = (r.getLong(0), r.getLong(1))
      (c - d).toDouble / (c + d)
    }
    assert(gammaOf(Seq((0L, 0L, 5L), (1L, 1L, 5L), (2L, 2L, 5L))) == 1.0)
    assert(gammaOf(Seq((0L, 2L, 5L), (1L, 1L, 5L), (2L, 0L, 5L))) == -1.0)
  }

  test("q345 gate frame: gamma in [-1, 1], pair counts consistent") {
    val out = SparkEntry.queries("q345_gk_gamma")(spark, dir)
      .select("concordant", "discordant", "gamma")
      .as[(Long, Long, Double)].head()
    val (c, d, g) = out
    assert(c > 0 && d > 0)
    assert(g >= -1.0 && g <= 1.0)
    assert(math.abs(g - (c - d).toDouble / (c + d)) < 1e-3)
    // price and an unrelated customer's balance: near-independent
    assert(math.abs(g) < 0.2)
  }

  test("q346: closed form on a uniform group") {
    // 1000 points uniform-ish: IQR = q75-q25; h = 2*IQR/n^(1/3)
    val xs = (1 to 1000).map(_.toDouble).toDF("x")
    val r = xs.agg(count(lit(1)).as("n"),
        expr("percentile(x, 0.25)").as("q25"),
        expr("percentile(x, 0.75)").as("q75"),
        min("x").as("mn"), max("x").as("mx")).head()
    val (n, q25, q75) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val h = 2.0 * (q75 - q25) / math.pow(n.toDouble, 1.0 / 3.0)
    assert(q25 == 250.75 && q75 == 750.25) // type-7 interpolation
    assert(math.abs(h - 2.0 * 499.5 / 10.0) < 1e-9)
  }

  test("q346 gate frame: positive widths, n_bins covers the range") {
    val out = SparkEntry.queries("q346_fd_bins")(spark, dir)
      .select("n", "iqr", "bin_width", "n_bins")
      .as[(Long, Double, Double, Long)].collect()
    assert(out.length == 3)
    out.foreach { case (n, iqr, h, k) =>
      assert(n > 0 && iqr > 0 && h > 0 && k > 0)
      // h shrinks as n^(1/3): k within sane bounds
      assert(k >= 5 && k <= 1000)
    }
  }

  test("q347: the keep probability is 1 below threshold, decreasing above") {
    def pKeep(f: Double): Double =
      math.min(1.0, (math.sqrt(f / 1e-3) + 1.0) * (1e-3 / f))
    assert(pKeep(1e-3) > 1.0 - 1e-9) // exactly at t: sqrt(1)+1 = 2 -> 2*t/f = 2 -> capped
    assert(pKeep(0.01) < pKeep(0.005))
    assert(math.abs(pKeep(0.01) - (math.sqrt(10.0) + 1.0) * 0.1) < 1e-12)
  }

  test("q347 gate frame: head terms ordered, probs in (0,1]") {
    val out = SparkEntry.queries("q347_subsample_probs")(spark, dir)
      .select("n_term", "f", "p_keep")
      .as[(Long, Double, Double)].collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.sliding(2).forall {
      case Array(x, y) => x._1 >= y._1; case _ => true
    })
    out.foreach { case (c, f, p) =>
      assert(c > 0 && f > 0 && p > 0 && p <= 1.0)
    }
    // frequent head terms must actually be downsampled
    assert(out.head._3 < 1.0)
  }
}
