package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-SIZE budget gate — the round-8 postmortem made concrete: a
  * correct query whose optimized plan carries ~10⁶ expression nodes
  * (q140's builtin AVI generator re-embedded by CollapseProject into
  * every per-byte decoder read) spends minutes of driver CPU in
  * Catalyst canonicalization before a single task launches, and no
  * value-correctness or plan-PROPERTY check sees it. This spec walks
  * EVERY gate query's optimized plan and fails any whose total
  * expression node count exceeds a budget that every legitimate query
  * sits far below — a regression of the CollapseProject-re-embedding
  * class trips it at build time instead of timing out the round bench.
  *
  * Budget rationale: the engine's largest legitimate plans (the 45-way
  * mapping pivot q40, the recall-gate pipelines recomposing three ANN
  * legs) measure in the low thousands of expression nodes; the q140
  * blowup measured ~10⁶. 50k sits an order of magnitude above the
  * biggest legitimate plan and two below the failure mode.
  */
class PlanBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Budget = 50000

  private def exprNodeCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collectWithSubqueries { case p =>
      p.expressions.map { e =>
        var n = 0
        e.foreach(_ => n += 1)
        n
      }.sum
    }.sum

  test(s"every gate query's optimized plan stays under $Budget expression nodes") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> exprNodeCount(fn(spark, dir))
    }
    val worst = counts.sortBy(-_._2).take(10)
      .map { case (n, c) => s"$n=$c" }.mkString(", ")
    info(s"largest plans: $worst")
    val over = counts.filter(_._2 > Budget)
    assert(over.isEmpty,
      s"plan-size budget exceeded (CollapseProject re-embedding class?): " +
        over.map { case (n, c) => s"$n=$c" }.mkString(", "))
  }
}
