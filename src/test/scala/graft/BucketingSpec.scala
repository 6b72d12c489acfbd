package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketing

/** Proves the co-located-join claim: joining two tables bucketed on the
  * join key plans with NO exchange (the scale property bucketing buys) —
  * plus the output-side layout twins (partitioned parquet sink). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned parquet sink: pruned layout, one file per value when compact, cardinality guard") {
    import graft.sink.ParquetSink
    val dir = java.nio.file.Files.createTempDirectory("graft-psink").toString + "/docs"
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars")
    ParquetSink.writePartitioned(df, dir, Seq("lang"))
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    // hive layout: lang=... directories, ONE part file inside each
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    langDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"compact write must emit one file per partition value, ${d.getName} has ${parts.length}")
    }
    // a filter on the partition column prunes to that directory's scan
    val pruned = back.filter(col("lang") === langDirs.head.getName.stripPrefix("lang="))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter must reach the scan:\n$scan")
    // runaway-cardinality layouts are refused
    intercept[IllegalArgumentException] {
      ParquetSink.writePartitioned(df, dir + "2", Seq("doc_id"), maxPartitions = 10)
    }
  }

  test("join of two tables bucketed on the key plans without a shuffle") {
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "av")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "bv")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4)
    Bucketing.writeBucketed(b, "bkt_b", "k", 4)
    // disable broadcast so the (tiny) fixtures plan the fact⋈fact
    // sort-merge shape the property is about
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(spark, "bkt_a")
        .join(Bucketing.readTable(spark, "bkt_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle; plan:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 1000)
      // the same join over plain (unbucketed) frames DOES shuffle —
      // the property comes from bucketing, not the data size
      val plain = a.join(b, Seq("k"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
