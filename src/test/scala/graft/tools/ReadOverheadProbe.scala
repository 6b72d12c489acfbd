package graft.tools

/** Measures the per-call metadata cost of `spark.read.parquet` (file
  * listing + footer schema inference) vs reusing a resolved DataFrame
  * handle — the bench runs ~1000 Tables.* loads across 496 rows, so a
  * per-load constant is a suite-wide multiplier. */
object ReadOverheadProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-read-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(what: String, n: Int = 10)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      println(f"$what%-52s ${(System.nanoTime() - t0) / 1e9 / n}%.4f s/call")
    }
    for (tab <- Seq("lineitem", "documents", "embeddings", "nation")) {
      t(s"spark.read.parquet($tab)  [metadata only]") {
        spark.read.parquet(s"$dir/$tab.parquet").schema
      }
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    t("reused handle: lineitem.filter.count") {
      li.filter(org.apache.spark.sql.functions.col("l_orderkey") % 10 === 0)
        .count()
    }
    t("fresh read: lineitem.filter.count") {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(org.apache.spark.sql.functions.col("l_orderkey") % 10 === 0)
        .count()
    }
    spark.stop()
  }
}
