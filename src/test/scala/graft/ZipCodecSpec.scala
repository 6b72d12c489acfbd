package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ZipBytes/ZipEntries (q414): the builder's archives are read back by
  * the REAL `java.util.zip` readers (both the streaming local-header
  * path and the central-directory path), the walker round-trips them,
  * and corruption is detected — structural breaks null the walk, a
  * payload bit-flip flips `crc_ok` without nulling. */
class ZipCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def buildZip(docs: Seq[(Long, String)]): Array[Byte] = {
    val s = spark; import s.implicits._
    docs.toDF("doc_id", "text")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
        .as("members"))
      .select(expr("graft_zip_bytes(members)").as("z"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  private def walk(zip: Array[Byte]) = {
    val s = spark; import s.implicits._
    Seq(zip).toDF("z")
      .select(expr("graft_zip_entries(z)").as("w"))
      .select(col("w.n_entries"), col("w.zip_len"),
        expr("inline(w.entries)"))
      .collect()
  }

  private def walkIsNull(zip: Array[Byte]): Boolean = {
    val s = spark; import s.implicits._
    Seq(zip).toDF("z")
      .select(expr("graft_zip_entries(z)").as("w"))
      .collect()(0).isNullAt(0)
  }

  private val docs = Seq(3L -> "hello zip", 7L -> "", 12L -> "αβγ utf-8 content",
    40L -> ("x" * 1000))

  test("java.util.zip reads the builder's bytes — both reader paths") {
    val zip = buildZip(docs)
    // streaming path (local headers)
    val in = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var e = in.getNextEntry
    while (e != null) {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var r = 0
      while ({ r = in.read(buf); r >= 0 }) bos.write(buf, 0, r)
      seen += ((e.getName, new String(bos.toByteArray, "UTF-8")))
      e = in.getNextEntry
    }
    assert(seen.toSeq ==
      docs.sortBy(_._1).map { case (id, t) => (s"$id.txt", t) })
    // central-directory path (ZipFile needs a real file)
    val f = java.io.File.createTempFile("graft", ".zip")
    try {
      java.nio.file.Files.write(f.toPath, zip)
      val zf = new java.util.zip.ZipFile(f)
      try {
        assert(zf.size() == docs.length)
        docs.foreach { case (id, t) =>
          val ze = zf.getEntry(s"$id.txt")
          assert(ze != null && ze.getSize == t.getBytes("UTF-8").length)
          val bytes = zf.getInputStream(ze).readAllBytes()
          assert(new String(bytes, "UTF-8") == t)
        }
      } finally zf.close()
    } finally f.delete()
  }

  test("walker round-trips: names, sizes, md5s, crc_ok, closed-form length") {
    val zip = buildZip(docs)
    val rows = walk(zip).map(r => (r.getInt(2), r.getString(3), r.getLong(4),
      r.getBoolean(5), r.getString(6), r.getInt(0), r.getLong(1)))
    assert(rows.length == docs.length)
    val sorted = docs.sortBy(_._1)
    val expLen = sorted.map { case (id, t) =>
      30 + s"$id.txt".length + t.getBytes("UTF-8").length }.sum +
      sorted.map { case (id, _) => 46 + s"$id.txt".length }.sum + 22
    rows.zip(sorted).foreach { case ((idx, name, size, crcOk, md5hex, n, zl),
        (id, t)) =>
      assert(n == docs.length && zl == expLen && zl == zip.length)
      assert(name == s"$id.txt" && size == t.getBytes("UTF-8").length)
      assert(crcOk, s"crc_ok false for $name")
      val md = java.security.MessageDigest.getInstance("MD5")
      val exp = md.digest(t.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(md5hex == exp)
      assert(idx == rows.indexWhere(_._2 == name))
    }
  }

  test("payload bit-flip flips crc_ok without nulling; structural breaks null") {
    val zip = buildZip(docs)
    // flip one byte inside the 1000-x payload (entry 40.txt is last by
    // doc_id order; its payload is easy to locate: search for "xxxx")
    val idx = {
      var i = 0
      while (!(zip(i) == 'x' && zip(i + 1) == 'x' && zip(i + 2) == 'x')) i += 1
      i + 500
    }
    val flipped = zip.clone(); flipped(idx) = 'y'.toByte
    val rows = walk(flipped)
    val byName = rows.map(r => r.getString(3) -> r.getBoolean(5)).toMap
    assert(!byName("40.txt"))
    assert(byName.filter(_._1 != "40.txt").values.forall(identity))
    // EOCD signature break → null
    val badEocd = zip.clone(); badEocd(zip.length - 22) = 0
    assert(walkIsNull(badEocd))
    // truncation → null
    assert(walkIsNull(zip.take(zip.length - 1)))
    // method byte (CD entry, offset +10 from CD sig) → null
    val cdOff = {
      var i = 0
      var found = -1
      while (found < 0 && i < zip.length - 4) {
        if ((zip(i) & 0xff) == 0x50 && (zip(i + 1) & 0xff) == 0x4b &&
          (zip(i + 2) & 0xff) == 0x01 && (zip(i + 3) & 0xff) == 0x02)
          found = i
        i += 1
      }
      found
    }
    val badMethod = zip.clone(); badMethod(cdOff + 10) = 8 // claim deflate
    assert(walkIsNull(badMethod))
    // empty archive (EOCD only) walks to zero entries
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
        .as("members"))
      .select(expr("graft_zip_bytes(members)").as("z"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(empty.length == 22)
    val er = {
      val df = Seq(empty).toDF("z")
        .select(expr("graft_zip_entries(z)").as("w"))
        .select(col("w.n_entries")).collect()
      df(0).getInt(0)
    }
    assert(er == 0)
  }
}
