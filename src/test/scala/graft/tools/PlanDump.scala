package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dumps the full `explain("formatted")` output of the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the optimization-round evidence
  * files (plans/rNN/<query>_before.txt / _after.txt). Usage:
  *
  *   Test/runMain graft.tools.PlanDump <outDir> <suffix> q223_golden_record ...
  *
  * Same session shape as [[PlanCheck]]: AQE off so the static plan is
  * readable (scan details, codegen ids), graft extensions registered.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query> [query ...]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val suffix = args(1)
    val wanted = args.drop(2).toSet
    val spark = graft.GraftSession.builder("graft-plandump", "local[4]", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted(name)) {
        try {
          val df = fn(spark, dir)
          val out = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
          Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), out.toString)
          println(s"wrote ${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"== $name PLAN ERROR ${e.getMessage.take(200)}")
        }
      }
    }
    spark.stop()
  }
}
