package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints plan-quality signals for every SparkEntry query: pushed
  * filters, scan schema width, join strategies, codegen spans. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    // GraftSession.builder so the native-expression registry is
    // present — without the extension every graft_* query errors at
    // analysis instead of printing its plan
    val spark = graft.GraftSession.builder("graft-plancheck", "local[4]", 4)
      // static plans: AQE wraps everything in AdaptiveSparkPlan and
      // withholds codegen ids until execution — for plan INSPECTION the
      // non-adaptive plan is the readable one (production sessions keep
      // AQE on; GraftSession does not set this)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val wanted = if (args.nonEmpty) args.toSet else Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted(name)) {
        try {
          // formatted mode — the AQE plan's bare toString hides codegen
          // spans and scan details on Spark 4
          val df = fn(spark, dir)
          val out = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
          val plan = out.toString
          val pushed = "PushedFilters: \\[[^\\]]+\\]".r
            .findAllIn(plan).toSeq.distinct.filterNot(_.contains("[]"))
          val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
            "BroadcastNestedLoopJoin", "ShuffledHashJoin")
            .map(j => j -> j.r.findAllIn(plan).size).filter(_._2 > 0)
          // formatted mode annotates operators with [codegen id : N];
          // distinct ids = whole-stage spans
          val wsc = "codegen id : (\\d+)".r
            .findAllMatchIn(plan).map(_.group(1)).toSet.size
          println(s"== $name")
          println(s"   joins=${joins.map { case (k, v) => s"$k x$v" }.mkString(", ")}" +
            s"  codegenSpans=$wsc  pushedFilterGroups=${pushed.size}")
          pushed.take(3).foreach(p => println(s"   $p"))
        } catch { case e: Throwable => println(s"== $name PLAN ERROR ${e.getMessage.take(100)}") }
      }
    }
    spark.stop()
  }
}
