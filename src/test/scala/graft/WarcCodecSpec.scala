package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{WarcBytes, WarcEntries}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** WARC codec: independent-parser round trip + strict-rejection
  * properties (the TarCodec test discipline). */
class WarcCodecSpec extends AnyFunSuite {

  private def members(docs: Seq[(Long, String)]) =
    new GenericArrayData(docs.map { case (id, t) =>
      new GenericInternalRow(Array[Any](id, UTF8String.fromString(t)))
    }.toArray[Any])

  private def build(docs: Seq[(Long, String)]): Array[Byte] =
    WarcBytes.build(members(docs))

  /** Independent parse: split records on the \r\n\r\n terminator after
    * Content-Length-measured payloads, using only String ops. */
  private def naiveParse(warc: Array[Byte]): Seq[(String, Option[String], Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Option[String], Long, Long)]
    var pos = 0
    while (pos < warc.length) {
      val off = pos.toLong
      val headEnd = {
        var i = pos
        while (!(warc(i) == '\r' && warc(i + 1) == '\n' &&
          warc(i + 2) == '\r' && warc(i + 3) == '\n')) i += 1
        i
      }
      val head = new String(warc, pos, headEnd - pos, "US-ASCII")
      val lines = head.split("\r\n")
      assert(lines.head == "WARC/1.0")
      val hs = lines.tail.map { l =>
        val Array(k, v) = l.split(": ", 2); k -> v
      }.toMap
      val clen = hs("Content-Length").toInt
      out += ((hs("WARC-Type"), hs.get("WARC-Target-URI"), off, clen.toLong))
      pos = headEnd + 4 + clen + 4
    }
    out.toSeq
  }

  test("round trip: strict walker and naive parser agree on real shards") {
    val docs = Seq(1L -> "hello world", 42L -> "", 7L -> "café über",
      999999L -> ("x" * 1000))
    val warc = build(docs)
    val naive = naiveParse(warc)
    val row = WarcEntries.walk(warc)
    assert(row != null)
    assert(row.getInt(0) == docs.length + 1)
    assert(row.getLong(1) == warc.length.toLong)
    val recs = row.getArray(2)
    assert(recs.numElements() == docs.length + 1)
    (0 until recs.numElements()).foreach { i =>
      val r = recs.getStruct(i, 6)
      val (t, uri, off, clen) = naive(i)
      assert(r.getInt(0) == i)
      assert(r.getUTF8String(1).toString == t)
      assert(Option(r.getUTF8String(2)).map(_.toString) == uri)
      assert(r.getLong(3) == off)
      assert(r.getLong(4) == clen)
    }
    // warcinfo first, then responses in member order; UTF-8 payload
    // lengths are octets, not chars
    assert(naive.head._1 == "warcinfo")
    assert(naive(3)._4 == "café über".getBytes("UTF-8").length)
  }

  test("payload md5 equals md5(text) for every member") {
    val docs = Seq(5L -> "some text here", 6L -> "znaczy się")
    val row = WarcEntries.walk(build(docs))
    val recs = row.getArray(2)
    docs.zipWithIndex.foreach { case ((_, t), i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(recs.getStruct(i + 1, 6).getUTF8String(5).toString == hex)
    }
  }

  test("strict walker rejects every corruption class") {
    val warc = build(Seq(1L -> "hello", 2L -> "world"))
    assert(WarcEntries.walk(warc) != null)
    // truncation (mid-payload and mid-terminator)
    assert(WarcEntries.walk(warc.take(warc.length - 1)) == null)
    assert(WarcEntries.walk(warc.take(200)) == null)
    // trailing slack after the last record
    assert(WarcEntries.walk(warc ++ Array[Byte]('x')) == null)
    // version line damage
    val v = warc.clone; v(5) = '2'
    assert(WarcEntries.walk(v) == null)
    // bare LF in the header block (CRLF discipline)
    val lf = warc.clone; lf(8) = 'X' // overwrite '\r' of the version line
    assert(WarcEntries.walk(lf) == null)
    // content-length digit damage makes the terminator land elsewhere
    val s = new String(warc, "ISO-8859-1")
    val cl = s.indexOf("Content-Length: 5\r\n", s.indexOf("response"))
    val d = warc.clone; d(cl + 16) = '7'
    assert(WarcEntries.walk(d) == null)
    // empty input
    assert(WarcEntries.walk(Array.emptyByteArray) == null)
  }

  test("mandatory-field enforcement: a response without a target URI is rejected") {
    val warc = build(Seq(3L -> "abc"))
    val s = new String(warc, "ISO-8859-1")
    // surgically rename WARC-Target-URI so the field is "missing"
    // (same lengths, still CRLF-clean)
    val patched = s.replace("WARC-Target-URI: ", "WARC-Target-URX: ")
      .getBytes("ISO-8859-1")
    assert(WarcEntries.walk(patched) == null)
  }

  test("duplicate named field (two Content-Lengths) is rejected, not last-wins") {
    val warc = build(Seq(3L -> "abc"))
    val s = new String(warc, "ISO-8859-1")
    // inject a SECOND, conflicting Content-Length line into the
    // response header block; last-wins parsing would use 3 and still
    // frame correctly — the strict contract is NULL
    val respAt = s.indexOf("WARC-Type: response")
    val insertAt = s.indexOf("Content-Length: 3\r\n", respAt)
    val patched = (s.substring(0, insertAt) + "Content-Length: 0\r\n" +
      s.substring(insertAt)).getBytes("ISO-8859-1")
    assert(WarcEntries.walk(patched) == null)
  }

  test("encoder refuses a payload the strict walker would reject") {
    val big = new String(Array.fill(WarcBytes.MaxPayloadBytes + 1)('a'))
    val e = intercept[IllegalArgumentException] {
      build(Seq(5L -> big))
    }
    assert(e.getMessage.contains("cap"))
    // at the cap itself build→walk still round-trips (total on the
    // encoder's output domain)
    val atCap = build(Seq(5L -> "x"))
    assert(WarcEntries.walk(atCap) != null)
  }
}
