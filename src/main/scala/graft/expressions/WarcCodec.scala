package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ISO 28500 WARC (Web ARChive) shard encode/decode as native
  * expressions — the format the big crawl corpora actually ship in
  * (Common Crawl's WARC/WET files are THE upstream of most LLM
  * pretraining text), completing the container trio beside the
  * sequential tar ([[TarBytes]]) and random-access zip ([[ZipBytes]])
  * shards.
  *
  * [[WarcBytes]] takes a shard's members as an ordered
  * `array<struct<doc_id: long, text: string>>` and emits a conforming
  * WARC/1.0 file: one `warcinfo` record (fixed 16-byte
  * `software: graft\n` payload), then one `response` record per doc —
  * version line, the mandatory named fields (WARC-Type,
  * WARC-Record-ID `<urn:graft:ID>`, a fixed WARC-Date for determinism,
  * WARC-Target-URI `https://example.org/doc/ID`, Content-Type,
  * Content-Length in octets), CRLF-blank-line, the UTF-8 payload, and
  * the spec's two-CRLF record terminator. Every byte is a pure
  * function of the docs, so record lengths and offsets have closed
  * forms the SQL oracle restates (the q157 tar discipline).
  *
  * [[WarcEntries]] is a strict walker, not a restatement: it verifies
  * the version line, parses the named-field block (rejecting a missing
  * mandatory field, a non-numeric Content-Length, an unbracketed
  * record id, or a bare LF), bounds the declared length before any
  * allocation-sized use, md5s the payload, requires the exact
  * `\r\n\r\n` terminator after every record and end-of-buffer
  * termination, and returns `(n_records, warc_len, records(idx,
  * rec_type, uri, off, content_length, payload_md5))` — NULL for ANY
  * non-conforming byte. `off` is the MEASURED byte offset of each
  * record, which the oracle recomputes arithmetically — the round trip
  * proves the layout, not just the parse.
  */
case class WarcBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _), StructField(_, StringType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_warc_bytes requires array<struct<long, string>>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_warc_bytes"

  override def nullSafeEval(input: Any): Any =
    WarcBytes.build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WarcBytes.build($c);")

  override protected def withNewChildInternal(newChild: Expression): WarcBytes =
    copy(child = newChild)
}

object WarcBytes {
  private[expressions] val Date = "2024-01-01T00:00:00Z"
  private[expressions] val InfoPayload = "software: graft\n"

  /** Hard payload cap shared with the strict walker: the walker
    * rejects Content-Length values above 2^26 (and >8 digits), so the
    * encoder must refuse to EMIT such a record — otherwise build→walk
    * is not total on the encoder's own output domain (a shard the
    * engine built would round-trip to NULL for very large documents).
    * 2^26 = 67,108,864 has 8 digits, so this single bound implies the
    * walker's digit bound too. */
  val MaxPayloadBytes: Int = 1 << 26

  /** Build the shard's WARC bytes. Public + static-shaped so generated
    * code can call it. Throws on a payload above [[MaxPayloadBytes]]
    * rather than emitting a record its own walker would reject. */
  def build(members: ArrayData): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(4096)
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    ascii("WARC/1.0\r\n")
    ascii("WARC-Type: warcinfo\r\n")
    ascii("WARC-Record-ID: <urn:graft:warcinfo>\r\n")
    ascii(s"WARC-Date: $Date\r\n")
    ascii("Content-Type: application/warc-fields\r\n")
    ascii(s"Content-Length: ${InfoPayload.length}\r\n")
    ascii("\r\n")
    ascii(InfoPayload)
    ascii("\r\n\r\n")
    val n = members.numElements()
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      val id = row.getLong(0)
      val payload = row.getUTF8String(1).toString.getBytes("UTF-8")
      if (payload.length > MaxPayloadBytes)
        throw new IllegalArgumentException(
          s"graft_warc_bytes: doc $id payload is ${payload.length} bytes, " +
            s"above the $MaxPayloadBytes-byte WARC record cap the strict " +
            "walker enforces; shard oversized documents upstream")
      ascii("WARC/1.0\r\n")
      ascii("WARC-Type: response\r\n")
      ascii(s"WARC-Record-ID: <urn:graft:$id>\r\n")
      ascii(s"WARC-Date: $Date\r\n")
      ascii(s"WARC-Target-URI: https://example.org/doc/$id\r\n")
      ascii("Content-Type: text/plain\r\n")
      ascii(s"Content-Length: ${payload.length}\r\n")
      ascii("\r\n")
      bos.write(payload)
      ascii("\r\n\r\n")
      i += 1
    }
    bos.toByteArray
  }
}

case class WarcEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_warc_entries requires binary input, got $t")
  }
  override def dataType: DataType = WarcEntries.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_entries"

  override def nullSafeEval(input: Any): Any =
    WarcEntries.walk(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.WarcEntries.walk($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WarcEntries =
    copy(child = newChild)
}

object WarcEntries {

  val recordSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("off", LongType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("n_records", IntegerType, nullable = false),
    StructField("warc_len", LongType, nullable = false),
    StructField("records", ArrayType(recordSchema, containsNull = false),
      nullable = false)))

  /** Strict whole-file walk → record list, or null for any
    * non-conforming byte. Public + static-shaped so generated code can
    * call it. */
  def walk(warc: Array[Byte]): InternalRow = {
    if (warc == null || warc.length == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pos = 0
    var idx = 0
    // one CRLF-terminated line starting at p, or -1 on a bare LF / no
    // terminator; returns (line text, next position)
    def line(p: Int): (String, Int) = {
      var i = p
      while (i + 1 < warc.length && !(warc(i) == '\r' && warc(i + 1) == '\n')) {
        if (warc(i) == '\n') return (null, -1)
        i += 1
      }
      if (i + 1 >= warc.length) return (null, -1)
      (new String(warc, p, i - p, "US-ASCII"), i + 2)
    }
    while (pos < warc.length) {
      val off = pos
      val (ver, p0) = line(pos)
      if (p0 < 0 || ver != "WARC/1.0") return null
      var p = p0
      val headers = scala.collection.mutable.Map.empty[String, String]
      var blank = false
      while (!blank) {
        val (l, np) = line(p)
        if (np < 0) return null
        if (l.isEmpty) blank = true
        else {
          val c = l.indexOf(": ")
          if (c <= 0) return null
          val k = l.substring(0, c)
          // a repeated named field (e.g. two conflicting
          // Content-Length lines) is non-conforming — reject rather
          // than silently keeping the later value
          if (headers.contains(k)) return null
          headers(k) = l.substring(c + 2)
        }
        p = np
      }
      val recType = headers.getOrElse("WARC-Type", return null)
      val recId = headers.getOrElse("WARC-Record-ID", return null)
      if (!(recId.startsWith("<") && recId.endsWith(">"))) return null
      if (!headers.contains("WARC-Date")) return null
      val lenStr = headers.getOrElse("Content-Length", return null)
      if (lenStr.isEmpty || !lenStr.forall(_.isDigit) ||
        lenStr.length > 8) return null
      val clen = lenStr.toLong
      if (clen > (1 << 26)) return null
      if (recType == "response" && !headers.contains("WARC-Target-URI"))
        return null
      if (p + clen + 4 > warc.length) return null
      md.reset()
      md.update(warc, p, clen.toInt)
      val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
      val t = p + clen.toInt
      if (!(warc(t) == '\r' && warc(t + 1) == '\n' &&
        warc(t + 2) == '\r' && warc(t + 3) == '\n')) return null
      val uri = headers.get("WARC-Target-URI")
        .map(UTF8String.fromString).orNull
      out += new GenericInternalRow(Array[Any](idx,
        UTF8String.fromString(recType), uri, off.toLong, clen,
        UTF8String.fromString(hex)))
      pos = t + 4
      idx += 1
    }
    new GenericInternalRow(Array[Any](out.length, warc.length.toLong,
      new GenericArrayData(out.toArray[Any])))
  }
}
