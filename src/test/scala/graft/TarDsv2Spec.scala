package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q384 — the graft-tar DataSourceV2: framing, pruning, pushdown. */
class TarDsv2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three tiny shards written through the production writer. */
  private lazy val stage: String = {
    val dir = java.nio.file.Files.createTempDirectory("tarv2_spec_")
    val docs = (0L until 130L).map(i => (i, s"doc $i body " + ("x" * (i % 7).toInt)))
      .toDF("doc_id", "text")
    docs
      .select((col("doc_id") / 50).cast("long").as("shard"),
        struct(col("doc_id"), col("text")).as("m"))
      .groupBy("shard")
      .agg(sort_array(collect_list(col("m"))).as("members"))
      .select(col("shard"),
        graft.operators.Multimodal.tarBytes(col("members")).as("t"))
      .collect()
      .foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir.toString,
            f"shard-${r.getLong(0)}%05d.tar"),
          r.getAs[Array[Byte]](1))
      }
    dir.toString
  }

  private def table = spark.read.format("graft-tar").load(stage)

  test("manifest framing: every member, archive-ordinal idx, right sizes") {
    val rows = table.select("shard_file", "idx", "name", "size")
      .as[(String, Int, String, Long)].collect()
    assert(rows.length == 130)
    // idx is the in-archive ordinal, names are doc_id.txt in doc order
    val shard0 = rows.filter(_._1 == "shard-00000.tar").sortBy(_._2)
    assert(shard0.map(_._3).toSeq == (0 until 50).map(_ + ".txt"))
    rows.foreach { case (_, _, name, size) =>
      val id = name.stripSuffix(".txt").toLong
      assert(size == s"doc $id body ".length + (id % 7))
    }
  }

  test("text column round-trips member payloads") {
    val got = table.select("name", "text").as[(String, String)]
      .collect().toMap
    assert(got("7.txt") == "doc 7 body ")
    assert(got("129.txt") == "doc 129 body " + "x" * (129 % 7).toInt)
  }

  test("shard_file equality prunes input partitions at planning time") {
    val one = table.filter(col("shard_file") === "shard-00001.tar")
      .select("name")
    assert(one.rdd.getNumPartitions == 1)
    assert(table.select("name").rdd.getNumPartitions == 3)
    assert(one.count() == 50)
  }

  test("column pruning reaches the scan: unselected text/md5 not read") {
    val df = table.select("name", "size")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans.nonEmpty)
    assert(scans.head.toSet == Set("name", "size"))
  }

  test("name StringStartsWith is pushed and fully enforced") {
    val df = table.filter(col("name").startsWith("12"))
      .select("name")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scans.exists(_.contains("StringStartsWith")))
    assert(df.as[String].collect().toSet ==
      Set("12.txt", "120.txt", "121.txt", "122.txt", "123.txt",
        "124.txt", "125.txt", "126.txt", "127.txt", "128.txt",
        "129.txt"))
  }

  test("payload_md5 matches md5 of the member text") {
    val got = table.select("name", "payload_md5", "text")
      .as[(String, String, String)].collect()
    got.foreach { case (_, m, t) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val exp = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(m == exp)
    }
  }
}
