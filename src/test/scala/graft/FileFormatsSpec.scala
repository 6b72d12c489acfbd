package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.FileFormats

/** JSONL/ORC interchange: schema-pinned single-pass reads, lossless
  * round-trips, explicit corrupt-row policy. */
class FileFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  test("JSONL round-trip is lossless under an explicit schema") {
    val src = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    val path = "/tmp/graft_jsonl_rt"
    FileFormats.writeJsonl(src, path)
    val back = FileFormats.readJsonl(spark, path, ordersSchema)
    assert(back.schema == ordersSchema)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      src.as[(Long, String, Double)].collect().toSet)
  }

  test("JSONL corrupt-row policy: DROPMALFORMED drops, PERMISSIVE captures, FAILFAST throws") {
    val path = "/tmp/graft_jsonl_bad"
    val lines = Seq(
      """{"o_orderkey": 1, "o_orderstatus": "O", "o_totalprice": 10.5}""",
      """not json at all""",
      """{"o_orderkey": 2, "o_orderstatus": "F", "o_totalprice": 20.0}""")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$path/part.jsonl"),
      lines.mkString("\n").getBytes)
    val dropped = FileFormats.readJsonl(spark, path, ordersSchema,
      mode = "DROPMALFORMED")
    assert(dropped.count() == 2)
    val permissiveSchema = ordersSchema.add("_corrupt_record", StringType)
    // Spark disallows querying only _corrupt_record from the raw scan;
    // cache the parsed rows first (the documented pattern)
    val kept = FileFormats.readJsonl(spark, path, permissiveSchema,
      mode = "PERMISSIVE").cache()
    assert(kept.count() == 3)
    assert(kept.filter(col("_corrupt_record").isNotNull).count() == 1)
    kept.unpersist()
    val failfast = FileFormats.readJsonl(spark, path, ordersSchema)
    assertThrows[org.apache.spark.SparkException](failfast.count())
  }

  test("q197 pushes its predicate into the ORC scan and matches the parquet truth") {
    val gate = SparkEntry.queries("q197_orc_roundtrip")(spark, dir)
    val plan = gate.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,120)]"),
      s"ORC scan must carry the pushed predicate; plan was:\n$plan")
    val truth = graft.sources.Tables.documents(spark, dir)
      .where(col("n_chars") >= 120)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
      .as[(String, Long, Long)].collect().toSeq
    val got = gate.select(col("lang"), col("n_docs"), col("sum_chars"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == truth)
  }

  test("XML round-trip survives entity escaping: & < > quotes and newlines") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("body", StringType)))
    val src = Seq(
      (1L, "plain text"),
      (2L, "a & b < c > d \"quoted\" 'single'"),
      (3L, "<doc>looks like markup</doc>"),
      (4L, "line one\nline two"))
      .toDF("id", "body")
    val path = "/tmp/graft_xml_rt"
    FileFormats.writeXml(src, path, rowTag = "doc", rootTag = "docs")
    val back = FileFormats.readXml(spark, path, schema, rowTag = "doc")
    assert(back.schema == schema)
    assert(back.as[(Long, String)].collect().toSet ==
      src.as[(Long, String)].collect().toSet)
  }

  test("q211 prunes lang partitions at the scan and pushes the n_chars data filter") {
    val gate = SparkEntry.queries("q211_partition_prune")(spark, dir)
    val plan = gate.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions (directory-level), plan was:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(n_chars,100)"),
      s"n_chars filter must push into the data scan; plan was:\n$plan")
    // pruning must not change content: gate totals = unpartitioned truth
    val truth = graft.sources.Tables.documents(spark, dir)
      .where(col("lang") === "en" && col("n_chars") >= 100)
      .agg(count(lit(1)), sum("n_chars")).as[(Long, Long)].head()
    val got = gate.agg(sum("n_docs"), sum("sum_chars")).as[(Long, Long)].head()
    assert(got == truth)
  }

  test("ORC round-trip preserves schema and data, including arrays") {
    val src = Seq(
      (1L, "alpha", Seq(1.0, 2.0)),
      (2L, "beta", Seq.empty[Double]))
      .toDF("id", "name", "vec")
    val path = "/tmp/graft_orc_rt"
    FileFormats.writeOrc(src, path)
    val back = FileFormats.readOrc(spark, path)
    assert(back.schema("vec").dataType == ArrayType(DoubleType))
    assert(back.as[(Long, String, Seq[Double])].collect().toSet ==
      src.as[(Long, String, Seq[Double])].collect().toSet)
  }
}
