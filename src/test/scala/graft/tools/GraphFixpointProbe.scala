package graft.tools

import org.apache.spark.sql.functions._

/** Micro-probe for the export graph stages' per-iteration overhead:
  * times GraphOps.detectCycles and topoDepth on a synthetic
  * set→member edge frame the size of the q470 dictionary graph, under
  * the same session shape as the bench (local[32], 32 shuffle
  * partitions, AQE default-on). */
object GraphFixpointProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-fixpoint-probe")
    import spark.implicits._
    val n = 5000L
    val ids = spark.range(1, n + 1).select(col("id").as("c"))
    val edges = ids.filter(col("c") % 7 === 0)
      .select(col("c").as("src"), explode(array(lit(1), lit(2), lit(3))).as("k"))
      .select(concat(lit("u"), col("src")).as("src"),
        concat(lit("u"), col("src") + col("k")).as("dst"))
      .localCheckpoint()
    println(s"edges: ${edges.count()}")
    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$what%s took ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm both paths once, then time
    t("warm detectCycles")(graft.graph.GraphOps.detectCycles(edges))
    t("warm topoDepth")(graft.graph.GraphOps.topoDepth(edges).count())
    (1 to 3).foreach { i =>
      t(s"detectCycles $i")(graft.graph.GraphOps.detectCycles(edges))
      t(s"topoDepth $i")(graft.graph.GraphOps.topoDepth(edges).count())
    }
    spark.stop()
  }
}
