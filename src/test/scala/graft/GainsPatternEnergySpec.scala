package graft

import org.scalatest.funsuite.AnyFunSuite

/** q394 gains table, q395 session pattern match, q396 energy distance. */
class GainsPatternEnergySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("q394 gate frame: deciles partition, capture ends at 1, lift ~1 " +
      "for a random score") {
    val rows = SparkEntry.queries("q394_gains_table")(spark, dir)
      .select("decile", "n", "np", "cum_capture", "lift")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val nVecs = sources.Tables.embeddings(spark, dir).count()
    assert(rows.map(_._2).sum == nVecs)
    // ntile balance: bucket sizes differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    assert(math.abs(rows.last._4 - 1.0) < 1e-9)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    // the md5 score carries no signal: every decile's lift near 1
    rows.foreach { case (_, _, _, _, l) => assert(l > 0.5 && l < 1.6) }
  }

  test("q395: the pattern regex semantics on crafted sequences") {
    // contiguous c v* p must match; interruptions must not
    val re = "cv*p".r
    assert(re.findFirstIn("escvvvpse").isDefined)
    assert(re.findFirstIn("cp").isDefined) // zero views allowed
    assert(re.findFirstIn("cvsvp").isEmpty) // signup breaks the run
    assert(re.findFirstIn("pvc").isEmpty) // order matters
  }

  test("q395 gate frame: counts bounded and internally consistent") {
    val (ns, nm, me, mr) =
      SparkEntry.queries("q395_pattern_match")(spark, dir)
        .select("n_sessions", "n_matched", "mean_events", "match_rate")
        .as[(Long, Long, Double, Double)].head()
    assert(ns > 0 && nm >= 0 && nm <= ns)
    assert(me >= 1.0)
    assert(math.abs(mr - nm.toDouble / ns) < 1e-3)
    // sessions can't outnumber events
    assert(ns <= sources.Tables.events(spark, dir).count())
  }

  test("q396: energy distance closed forms") {
    def e(a: Seq[Long], b: Seq[Long]): Double = {
      def m(x: Seq[Long], y: Seq[Long]) =
        (for (i <- x; j <- y) yield math.abs(i - j).toDouble).sum /
          (x.size * y.size)
      2 * m(a, b) - m(a, a) - m(b, b)
    }
    assert(e(Seq(1L, 2, 3), Seq(1L, 2, 3)) == 0.0) // identical: zero
    assert(e(Seq(0L, 0, 0), Seq(10L, 10, 10)) == 20.0) // pure shift
    assert(e(Seq(1L, 2), Seq(5L, 9)) > 0.0)
  }

  test("q396 gate frame: nonnegative, statistic scales the distance") {
    val (na, nb, ed, es) =
      SparkEntry.queries("q396_energy_dist")(spark, dir)
        .select("n_days_a", "n_days_b", "energy_dist", "e_statistic")
        .as[(Long, Long, Double, Double)].head()
    assert(na == 30 && nb == 30)
    assert(ed >= 0.0) // energy distance is a metric
    assert(math.abs(es - ed * (na.toDouble * nb / (na + nb))) < 5e-3)
  }
}
