package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes the graph-fixpoint per-iteration cost at bench scale:
  * bare job submission, localCheckpoint of a trivial frame, one
  * join+agg+join iteration (the topoDepth shape) checkpointed, and the
  * same with both sides pre-hash-partitioned on the join key — to tell
  * scheduling overhead from exchange count from planning time. */
object IterOverheadProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-iter-probe")
    import org.apache.spark.sql.DataFrame
    def t(what: String, n: Int = 5)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      println(f"$what%-42s ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/iter")
    }
    val n = 5000L
    val ids = spark.range(1, n + 1).select(col("id").as("c"))
    val edges = ids.filter(col("c") % 7 === 0)
      .select(col("c").as("src"), explode(array(lit(1), lit(2), lit(3))).as("k"))
      .select(concat(lit("u"), col("src")).as("src"),
        concat(lit("u"), col("src") + col("k")).as("dst"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val depth0 = nodes.withColumn("depth", lit(0)).localCheckpoint()

    t("bare job: spark.range(1).count")(spark.range(1).count())
    t("localCheckpoint(trivial 1-row frame)") {
      val df = spark.range(1).toDF("x").localCheckpoint(eager = true)
      org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(df)
    }
    t("count on already-checkpointed frame")(depth0.count())

    def iterBody(e: DataFrame, d: DataFrame): DataFrame = {
      val cand = e.join(d, e("dst") === d("node"))
        .groupBy(col("src").as("node2"))
        .agg((max(col("depth")) + 1).as("cand"))
      d.join(cand, d("node") === cand("node2"), "left")
        .select(col("node"),
          greatest(col("depth"), coalesce(col("cand"), lit(0))).as("depth"))
    }
    t("iter: EAGER checkpoint + count", 10) {
      val nx = iterBody(edges, depth0).localCheckpoint(eager = true)
      nx.filter(col("depth") >= 0).count()
      org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(nx)
    }
    // r17: the same eager-checkpoint iteration with AQE off — how much
    // of the per-iteration constant is AQE's sequential shuffle-stage
    // job submission vs work?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("iter: EAGER checkpoint + count, AQE OFF", 10) {
      val nx = iterBody(edges, depth0).localCheckpoint(eager = true)
      nx.filter(col("depth") >= 0).count()
      org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(nx)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t("iter: LAZY checkpoint + count", 10) {
      val nx = iterBody(edges, depth0).localCheckpoint(eager = false)
      nx.filter(col("depth") >= 0).count()
      org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(nx)
    }
    t("iteration, plan only (no action)") {
      iterBody(edges, depth0).queryExecution.executedPlan
    }
    // pre-partitioned variants: both sides hash-partitioned on the
    // join keys before the loop — does Catalyst drop the exchanges?
    val eP = edges.repartition(col("dst")).localCheckpoint(eager = true)
    val dP = depth0.repartition(col("node")).localCheckpoint(eager = true)
    t("iteration, inputs pre-partitioned") {
      val nx = iterBody(eP, dP).localCheckpoint(eager = true)
      org.apache.spark.sql.GraftPlanBridge.freeLocalCheckpoint(nx)
    }
    val ex = iterBody(eP, dP).queryExecution.executedPlan.toString()
    println("exchanges in pre-partitioned iteration plan: " +
      "Exchange".r.findAllIn(ex).length)
    val ex0 = iterBody(edges, depth0).queryExecution.executedPlan.toString()
    println("exchanges in baseline iteration plan: " +
      "Exchange".r.findAllIn(ex0).length)
    spark.stop()
  }
}
