package graft.tools

import graft.operators.Dedup
import graft.sources.Tables

/** Scratch A/B probe: native one-pass winnow vs the builtin
  * explode+window composition, interleaved reps on one session (not a
  * test). `Test/runMain graft.tools.WinnowProbe [sfDir] [reps]`. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local("winnow-probe")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm the scan
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      time("native") {
        Dedup.winnowedDupPairs(docs, "doc_id", "text").count()
      }
      time("builtin") {
        Dedup.winnowedDupPairs(docs, "doc_id", "text",
          forceBuiltinWinnow = true).count()
      }
    }
    spark.stop()
  }
}
