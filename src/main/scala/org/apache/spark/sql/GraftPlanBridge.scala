package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one necessary `private[sql]` crossing: constructing a DataFrame
  * from a custom [[LogicalPlan]] node ([[graft.plans.AsofJoinNode]])
  * requires `classic.Dataset.ofRows`, which Spark scopes to its own
  * package. This object is the entire surface we take from it — no
  * other Spark internal is touched from outside its API. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
