package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch perf probe for the q223 entity-resolution stages (not a test). */
object ErProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val base = Tables.customer(spark, dir).select("c_custkey", "c_name",
      "c_nationkey", "c_acctbal", "c_mktsegment")
    base.count() // warm
    val dups = base.filter(pmod(col("c_custkey"), lit(10)) === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(col("c_name"), lit("X")).as("c_name"),
        col("c_nationkey"), (col("c_acctbal") + 1.0).as("c_acctbal"),
        col("c_mktsegment"))
    val recs = base.unionByName(dups)
    val left = recs.select(col("c_custkey").as("id_a"),
      col("c_name").as("na"), col("c_nationkey"), col("c_mktsegment"),
      col("c_acctbal").as("ba"))
    val right = recs.select(col("c_custkey").as("id_b"),
      col("c_name").as("nb"), col("c_nationkey"), col("c_mktsegment"),
      col("c_acctbal").as("bb"))
    val pairs = left.repartition(32).join(right, Seq("c_nationkey", "c_mktsegment"))
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("na"), col("nb")) <= 1 &&
        abs(col("ba") - col("bb")) <= 2.0)
      .select("id_a", "id_b")
    time("pairs")(pairs.count())
    time("pairs again")(pairs.count())
    time("cc")(graft.graph.GraphOps.connectedComponents(pairs).count())
    time("cc coalesced")(graft.graph.GraphOps.connectedComponents(pairs.coalesce(4)).count())
    time("full gate")(
      graft.operators.CoreQueries.goldenRecordCustomers(spark, dir).count())
    spark.stop()
  }
}
