package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q459 — the graft-warc DataSourceV2: framing, pruning, pushdown. */
class WarcDsv2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three tiny shards written through the production writer. */
  private lazy val stage: String = {
    val dir = java.nio.file.Files.createTempDirectory("warcv2_spec_")
    val docs = (0L until 130L).map(i => (i, s"doc $i body " + ("y" * (i % 5).toInt)))
      .toDF("doc_id", "text")
    docs
      .select((col("doc_id") / 50).cast("long").as("shard"),
        struct(col("doc_id"), col("text")).as("m"))
      .groupBy("shard")
      .agg(sort_array(collect_list(col("m"))).as("members"))
      .select(col("shard"),
        graft.operators.Multimodal.warcBytes(col("members")).as("w"))
      .collect()
      .foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir.toString,
            f"shard-${r.getLong(0)}%05d.warc"),
          r.getAs[Array[Byte]](1))
      }
    dir.toString
  }

  private def table = spark.read.format("graft-warc").load(stage)

  test("record framing: warcinfo first, responses in doc order, measured offsets") {
    val rows = table
      .select("shard_file", "idx", "rec_type", "uri", "off", "content_length")
      .as[(String, Int, String, Option[String], Long, Long)].collect()
    assert(rows.length == 133) // 130 responses + 3 warcinfo
    val shard0 = rows.filter(_._1 == "shard-00000.warc").sortBy(_._2)
    assert(shard0.head._3 == "warcinfo" && shard0.head._4.isEmpty &&
      shard0.head._5 == 0L && shard0.head._6 == 16L)
    assert(shard0.tail.map(_._3).forall(_ == "response"))
    assert(shard0.tail.map(_._4.get).toSeq ==
      (0 until 50).map(i => s"https://example.org/doc/$i"))
    // offsets strictly increase and each record fits before the next
    shard0.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 > a._5 + a._6)
    }
  }

  test("text column round-trips payloads") {
    val got = table.filter(col("rec_type") === "response")
      .select("uri", "text").as[(String, String)].collect().toMap
    assert(got("https://example.org/doc/7") == "doc 7 body yy")
    assert(got("https://example.org/doc/129") == "doc 129 body " + "y" * 4)
  }

  test("rec_type equality is pushed and enforced in the reader") {
    val df = table.filter(col("rec_type") === "response").select("uri")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scans.exists(s => s.contains("rec_type") && s.contains("response")))
    assert(df.count() == 130)
    assert(table.filter(col("rec_type") === "warcinfo").count() == 3)
  }

  test("shard_file equality prunes partitions; contradictions plan zero") {
    val one = table.filter(col("shard_file") === "shard-00001.warc")
      .select("rec_type")
    assert(one.rdd.getNumPartitions == 1)
    assert(table.select("rec_type").rdd.getNumPartitions == 3)
    assert(one.count() == 51)
    val contradiction = table
      .filter(col("shard_file") === "shard-00000.warc" &&
        col("shard_file") === "shard-00001.warc")
    assert(contradiction.count() == 0)
  }

  test("column pruning reaches the scan: unselected text/md5 not read") {
    val df = table.select("rec_type", "content_length")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans.nonEmpty)
    assert(scans.head.toSet == Set("rec_type", "content_length"))
  }

  test("reported statistics drive the broadcast decision") {
    // the scan reports post-pruning archive bytes (SupportsReport-
    // Statistics), so a small shard table lands under the broadcast
    // threshold and joins as the build side instead of sort-merge
    val big = spark.range(100000).selectExpr("id % 130 as doc_id")
    val manifest = table.filter(col("rec_type") === "response")
      .select(regexp_extract(col("uri"), "doc/(\\d+)", 1).cast("long")
        .as("doc_id"), col("content_length"))
    val joined = big.join(manifest, "doc_id")
    val hasBroadcast = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, joined.queryExecution.executedPlan.toString)
    assert(joined.count() > 0)
    // and the reported size is the real archive volume
    val stats = joined.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes)
    import scala.jdk.CollectionConverters._
    val archiveBytes = java.nio.file.Files.list(
        java.nio.file.Paths.get(stage)).iterator()
      .asScala.map(p => java.nio.file.Files.size(p)).sum
    assert(stats.exists(_ == BigInt(archiveBytes)))
  }

  test("structural corruption hard-fails the scan") {
    val dir = java.nio.file.Files.createTempDirectory("warcv2_bad_")
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(stage, "shard-00000.warc"))
    val bad = good.take(good.length - 2) // cut into the terminator
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, "shard-00000.warc"), bad)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir.toString)
        .select("rec_type").count()
    }
    assert(e.getMessage.contains("graft-warc") ||
      Option(e.getCause).exists(_.getMessage.contains("graft-warc")))
  }
}
