package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q428 — the graft-zip DataSourceV2: framing, pruning, pushdown, and
  * the RANGED-READ contract (a manifest scan reads catalog-sized byte
  * volume, never the archive). */
class ZipDsv2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three tiny shards written through the production writer —
    * payloads deliberately dwarf the catalog so the byte-accounting
    * assertion has teeth. */
  private lazy val stage: String = {
    val dir = java.nio.file.Files.createTempDirectory("zipv2_spec_")
    val docs = (0L until 130L)
      .map(i => (i, s"doc $i body " + ("x" * (100 + (i % 7)).toInt)))
      .toDF("doc_id", "text")
    docs
      .select((col("doc_id") / 50).cast("long").as("shard"),
        struct(col("doc_id"), col("text")).as("m"))
      .groupBy("shard")
      .agg(sort_array(collect_list(col("m"))).as("members"))
      .select(col("shard"),
        graft.operators.Multimodal.zipBytes(col("members")).as("z"))
      .collect()
      .foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir.toString,
            f"shard-${r.getLong(0)}%05d.zip"),
          r.getAs[Array[Byte]](1))
      }
    dir.toString
  }

  private def table = spark.read.format("graft-zip").load(stage)

  test("planning statistics are CD-summed emitted-row bytes, not raw archive bytes") {
    import java.nio.file.{Files, Paths}
    val shard = Paths.get(stage, "shard-00000.zip")
    val raw = Files.size(shard)
    val est = graft.sources.ZipScan.estimatedDataBytes(shard.toString)
    // exact contract: Σ (payload + name + 88B row overhead) over the
    // shard's members, computed independently from the manifest —
    // NOT a floor over raw size (an earlier formulation used
    // max(sum, raw), which for stored-only archives ALWAYS returned
    // raw and made the statistic a silent no-op)
    val want = table.filter(col("shard_file") === "shard-00000.zip")
      .select("size", "name").as[(Long, String)].collect()
      .map { case (sz, nm) => sz + nm.length + 88L }.sum
    assert(est == want, s"est=$est want=$want raw=$raw")
    // with short member names, emitted-row overhead exceeds the
    // archive's LOC/CD framing — the estimate must be allowed ABOVE
    // raw (a scan emitting more data than the optimizer thinks risks
    // broadcasting a non-broadcastable side)...
    assert(est > raw)
    // ...and within sane bounds of it for a stored-method archive
    assert(est < raw * 2)
    // a structurally bogus file falls back to its raw size
    val bogus = Files.createTempFile("graft_zipstats_", ".zip")
    Files.write(bogus, Array.fill[Byte](64)(7))
    assert(graft.sources.ZipScan.estimatedDataBytes(bogus.toString) == 64L)
    Files.delete(bogus)
  }

  test("manifest framing: every member, CD-ordinal idx, right sizes") {
    val rows = table.select("shard_file", "idx", "name", "size")
      .as[(String, Int, String, Long)].collect()
    assert(rows.length == 130)
    val shard0 = rows.filter(_._1 == "shard-00000.zip").sortBy(_._2)
    assert(shard0.map(_._3).toSeq == (0 until 50).map(_ + ".txt"))
    rows.foreach { case (_, _, name, size) =>
      val id = name.stripSuffix(".txt").toLong
      assert(size == s"doc $id body ".length + 100 + (id % 7))
    }
  }

  test("a manifest scan reads catalog-sized bytes, not the archive") {
    val archiveBytes = java.nio.file.Files.list(
        java.nio.file.Paths.get(stage)).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var total = 0L
    archiveBytes.forEachRemaining(p => total += java.nio.file.Files.size(p))
    graft.sources.ZipShardSource.bytesRead.set(0L)
    val n = table.select("name", "size").count()
    val manifestRead = graft.sources.ZipShardSource.bytesRead.get()
    assert(n == 130)
    // catalog = 3 EOCDs + 3 CDs (46+nameLen per member) — far under
    // the payload-dominated archive volume
    assert(manifestRead > 0)
    assert(manifestRead < total / 2,
      s"manifest scan read $manifestRead of $total archive bytes")
    // a text projection must read payload ranges too
    graft.sources.ZipShardSource.bytesRead.set(0L)
    table.select("text").as[String].collect()
    assert(graft.sources.ZipShardSource.bytesRead.get() > manifestRead)
  }

  test("text column round-trips member payloads") {
    val got = table.select("name", "text").as[(String, String)]
      .collect().toMap
    assert(got("7.txt") == "doc 7 body " + "x" * 100)
    assert(got("129.txt") == "doc 129 body " + "x" * (100 + 129 % 7))
  }

  test("shard_file equality prunes input partitions at planning time") {
    val one = table.filter(col("shard_file") === "shard-00001.zip")
      .select("name")
    assert(one.rdd.getNumPartitions == 1)
    assert(table.select("name").rdd.getNumPartitions == 3)
    assert(one.count() == 50)
  }

  test("conjunctive shard_file equalities intersect: a AND b plans zero rows") {
    val contradiction = table
      .filter(col("shard_file") === "shard-00000.zip" &&
        col("shard_file") === "shard-00001.zip")
    assert(contradiction.count() == 0)
  }

  test("column pruning reaches the scan; name prefix pushes and filters at the CD") {
    val df = table.select("name", "size")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans.nonEmpty && scans.head.toSet == Set("name", "size"))
    val pre = table.filter(col("name").startsWith("12")).select("name")
    val desc = pre.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }
    assert(desc.exists(_.contains("StringStartsWith")))
    assert(pre.as[String].collect().toSet ==
      Set("12.txt", "120.txt", "121.txt", "122.txt", "123.txt",
        "124.txt", "125.txt", "126.txt", "127.txt", "128.txt",
        "129.txt"))
    // prefix-filtered payload scans seek ONLY matching members
    graft.sources.ZipShardSource.bytesRead.set(0L)
    table.filter(col("name").startsWith("12")).select("text").collect()
    val filtered = graft.sources.ZipShardSource.bytesRead.get()
    graft.sources.ZipShardSource.bytesRead.set(0L)
    table.select("text").collect()
    val full = graft.sources.ZipShardSource.bytesRead.get()
    assert(filtered < full / 3,
      s"prefix-filtered payload scan read $filtered vs full $full")
  }

  test("structural corruption hard-fails: bad EOCD and non-stored method") {
    val dir = java.nio.file.Files.createTempDirectory("zipv2_bad_")
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(stage, "shard-00000.zip"))
    val badEocd = good.clone(); badEocd(good.length - 22) = 0
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, "bad.zip"), badEocd)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-zip").load(dir.toString)
        .select("name").collect()
    }
    assert(Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      .contains("EOCD"))
  }

  test("write path: per-partition shards, two-phase commit, round-trip") {
    val out = java.nio.file.Files.createTempDirectory("zipv2_write_").toString
    val docs = (0L until 90L).map(i => (i, s"written doc $i"))
    docs.toDF("doc_id", "text")
      .repartitionByRange(3, col("doc_id"))
      .write.format("graft-zip").mode("append").save(out)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val names = scala.collection.mutable.ArrayBuffer[String]()
    files.forEachRemaining(p => names += p.getFileName.toString)
    // exactly the committed part files — no temps survive the commit
    assert(names.forall(n => n.startsWith("part-") && n.endsWith(".zip")),
      names.mkString(","))
    assert(names.length == 3)
    // the engine's own reader round-trips the written shards
    val back = spark.read.format("graft-zip").load(out)
      .select("name", "text").as[(String, String)].collect().toMap
    assert(back.size == 90)
    docs.foreach { case (id, t) => assert(back(s"$id.txt") == t) }
    // java.util.zip reads a written shard (writer emits real PKZIP)
    val zf = new java.util.zip.ZipFile(
      java.nio.file.Paths.get(out, names.sorted.head).toFile)
    try assert(zf.size() > 0) finally zf.close()
    // overwrite truncates prior part files instead of accreting
    (1000L until 1010L).map(i => (i, s"second gen $i")).toDF("doc_id", "text")
      .coalesce(1)
      .write.format("graft-zip").mode("overwrite").save(out)
    val after = spark.read.format("graft-zip").load(out)
      .select("name").as[String].collect()
    assert(after.length == 10 && after.forall(_.startsWith("100")))
  }

  test("a leftover _tmp file from a crashed job is invisible to reads") {
    val out = java.nio.file.Files.createTempDirectory("zipv2_tmp_").toString
    (0L until 10L).map(i => (i, s"survivor $i")).toDF("doc_id", "text")
      .coalesce(1).write.format("graft-zip").mode("append").save(out)
    // simulate a crashed job: a torn temp (truncated shard) AND a
    // well-formed temp (duplicate rows) both left behind
    val committed = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .next()
    val bytes = java.nio.file.Files.readAllBytes(committed)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "_tmp-part-00007-99-deadbeef.zip"),
      bytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "_tmp-part-00008-99-deadbeef.zip"),
      bytes.take(bytes.length / 2))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, ".hidden.zip"), bytes)
    val back = spark.read.format("graft-zip").load(out)
      .select("name").as[String].collect()
    assert(back.length == 10, s"temps leaked into the scan: ${back.length}")
  }

  test("two appends accrete: job-unique part names never collide") {
    val out = java.nio.file.Files.createTempDirectory("zipv2_app2_").toString
    (0L until 20L).map(i => (i, s"gen1 $i")).toDF("doc_id", "text")
      .coalesce(1).write.format("graft-zip").mode("append").save(out)
    (100L until 120L).map(i => (i, s"gen2 $i")).toDF("doc_id", "text")
      .coalesce(1).write.format("graft-zip").mode("append").save(out)
    val back = spark.read.format("graft-zip").load(out)
      .select("name", "text").as[(String, String)].collect().toMap
    assert(back.size == 40, s"second append overwrote the first: ${back.size}")
    assert(back("7.txt") == "gen1 7" && back("107.txt") == "gen2 107")
  }

  test("corrupt CD nameLen fails structured, not StringIndexOutOfBounds") {
    val dir = java.nio.file.Files.createTempDirectory("zipv2_namelen_")
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(stage, "shard-00000.zip"))
    // EOCD is the last 22 bytes; CD offset at EOCD+16 (LE32). Patch the
    // FIRST CD entry's nameLen (entry offset + 28, LE16) to 0xFFFF.
    def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val cdOff = le32(good, good.length - 22 + 16)
    val bad = good.clone()
    bad(cdOff + 28) = 0xff.toByte; bad(cdOff + 29) = 0xff.toByte
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, "bad.zip"), bad)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-zip").load(dir.toString)
        .select("name").collect()
    }
    assert(Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      .contains("truncated central directory"))
  }

  test("payload_md5 matches md5 of the member text") {
    val got = table.select("name", "payload_md5", "text")
      .as[(String, String, String)].collect()
    got.foreach { case (_, m, t) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(m == md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString)
    }
  }
}
