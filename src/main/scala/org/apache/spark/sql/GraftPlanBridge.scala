package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD

/** The one necessary `private[sql]` crossing, two methods wide:
  *
  *  - [[ofRows]]: constructing a DataFrame from a custom
  *    [[LogicalPlan]] node ([[graft.plans.AsofJoinNode]]) requires
  *    `classic.Dataset.ofRows`, which Spark scopes to its own package.
  *  - [[freeLocalCheckpoint]]: releasing a superseded
  *    `localCheckpoint()`'s storage blocks requires the
  *    [[LogicalRDD]] the checkpointed Dataset wraps. Spark exposes no
  *    public API for this — `Dataset.unpersist` only reaches
  *    CacheManager entries, so a fixpoint's dead iterations otherwise
  *    pin BlockManager storage until a full GC lets the
  *    ContextCleaner's weak references fire. Measured round 10: the
  *    GC-debt left by one 4 s iterative query (q73 pagerank) taxed the
  *    next five bench queries 2–8 s each until the next scheduled
  *    `System.gc()`.
  *
  * CONTRACT for [[freeLocalCheckpoint]]: the DataFrame must be DEAD —
  * a localCheckpoint truncates lineage, so a freed checkpoint cannot
  * be recomputed; any later action on it (or a plan derived from it)
  * fails with missing-block errors. Callers only pass superseded
  * fixpoint iterations that are provably unreachable (the successor
  * was eagerly materialized first).
  *
  * No other Spark internal is touched from outside its API.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Unpersist the storage blocks behind a `localCheckpoint()`ed
    * DataFrame (non-blocking). No-op on plans with no [[LogicalRDD]]
    * leaf. See the class contract: the frame must never be read again. */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
