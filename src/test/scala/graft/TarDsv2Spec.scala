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

  test("conjunctive shard_file equalities intersect: a AND b plans zero rows") {
    // two distinct pushed EqualTo values can never both hold on a row;
    // the scan must plan ZERO partitions, not union the two files
    val contradiction = table
      .filter(col("shard_file") === "shard-00000.tar" &&
        col("shard_file") === "shard-00001.tar")
    assert(contradiction.count() == 0)
    // same value twice stays satisfiable
    val same = table
      .filter(col("shard_file") === "shard-00001.tar" &&
        col("shard_file") === "shard-00001.tar")
    assert(same.count() == 50)
  }

  test("oversized size field hard-fails instead of mis-framing") {
    // forge a header claiming an ~8.6e9-byte payload (11 octal 7s):
    // the reader must reject it loudly — a toInt-truncated pad length
    // would stall the scan or mis-frame the next entry
    val dir = java.nio.file.Files.createTempDirectory("tarv2_bad_")
    val block = new Array[Byte](512 * 3) // header + 2 terminator blocks
    val name = "huge.bin".getBytes("US-ASCII")
    System.arraycopy(name, 0, block, 0, name.length)
    val size = "77777777777".getBytes("US-ASCII") // max 11-digit octal
    System.arraycopy(size, 0, block, 124, size.length)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, "bad.tar"), block)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-tar").load(dir.toString)
        .select("name").collect()
    }
    assert(Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      .contains("out of bounds"))
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
