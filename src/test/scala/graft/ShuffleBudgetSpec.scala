package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-VOLUME budget gate — the byte-level complement to
  * PlanBudgetSpec's expression-node count (VERDICT r10 punch list #6):
  * a plan regression that re-embeds a generator, loses a broadcast, or
  * un-prunes a pair join shows up as shuffle BYTES long before it
  * times out a bench, and `bench_metrics.json` only records it after
  * the fact. This spec runs the suite's shuffle-heaviest queries at
  * sf0.01 under a stage-metrics listener and fails any query that
  * reads more shuffle data than its pinned ceiling.
  *
  * Ceilings: measured shuffle-read at sf0.01 on a cold session
  * (2026-08 HEAD), rounded up ~3× — far above attribution noise and
  * fair growth, far below the 10–100× a lost broadcast or quadratic
  * pair stage costs. The sf0.1 bench values (bench_metrics.json) are
  * ~8.5× the sf0.01 numbers, matching the row ratio — these queries
  * shuffle linearly. Attribution is approximate (listener events are
  * async; a post-query drain sleep catches them in practice — the
  * Bench.scala convention), and one-sided: pre-warmed shared stages
  * from other suites only shrink a query's measured bytes, never
  * inflate them past the ceiling.
  */
class ShuffleBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  /** (query, shuffle-read ceiling in MB at sf0.01). */
  private val Budgets: Seq[(String, Double)] = Seq(
    "q260_hyperanf" -> 15.0, // measured 3.60 MB
    "q73_pagerank" -> 3.0, // measured 0.58 MB
    "q364_harmonic2" -> 11.0, // measured 2.64 MB
    "q102_substring_keep" -> 11.0, // measured 2.57 MB
    "q324_adamic_adar" -> 8.0, // measured 1.87 MB
    "q171_prefix_filter_join" -> 9.0, // measured 2.18 MB
    "q84_percentile_trim" -> 8.0, // measured 1.93 MB
    "q147_containment_pairs" -> 3.0, // measured 0.59 MB
    "q129_quantile_norm" -> 4.0, // measured 0.91 MB
    "q369_neardup_transitivity" -> 3.0, // measured 0.55 MB
    // round-11 heavy additions (same ~3-4x-measured ceiling rule)
    "q410_hits" -> 4.0, // measured 1.06 MB
    "q417_ktruss" -> 10.0, // measured 2.65 MB
    "q418_ppr" -> 3.0, // measured 0.57 MB
    // round-12 star-contraction CC pair (iterative — a regression that
    // stops converging shows up as extra rounds of shuffle bytes here)
    "q432_cc_star" -> 1.5, // measured 0.13 MB
    "q436_cc_incremental" -> 1.5, // measured 0.12 MB
    // round-13 heavy additions; ceilings allow for a COLD session
    // (shared LM/fit stages un-warmed) on top of the measured
    // warm-session bytes
    "q445_kneser_ney_lm" -> 6.0, // measured 0.00 MB (stages warm)
    "q448_perplexity_filter" -> 8.0, // measured 0.09 MB (stages warm)
    "q454_ipw_ate" -> 6.0, // measured 1.50 MB
    "q455_rq_distortion" -> 3.0, // measured 0.49 MB
    "q456_signal_agreement" -> 6.0) // measured 0.07 MB (stages warm)

  test("the shuffle-heaviest queries stay under their pinned shuffle-read ceilings") {
    val read = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val over = Budgets.flatMap { case (name, ceilingMb) =>
        Thread.sleep(200) // drain listener events from the previous query
        val before = read.get
        SparkEntry.queries(name)(spark, dir).count()
        Thread.sleep(200)
        val gotMb = (read.get - before) / 1048576.0
        info(f"$name: $gotMb%.2f MB shuffle read (ceiling $ceilingMb%.1f)")
        if (gotMb > ceilingMb) Some(f"$name=$gotMb%.1fMB>(${ceilingMb}%.1f)")
        else None
      }
      assert(over.isEmpty,
        s"shuffle-read budget exceeded (lost broadcast / unpruned pair " +
          s"join class?): ${over.mkString(", ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
