package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PKZIP (APPNOTE) STORED-method archive encode/decode as native
  * expressions — the random-access container beside the sequential tar
  * shards ([[TarBytes]]): a zip carries its member catalog in a
  * CENTRAL DIRECTORY at the end, so an object-store reader can fetch
  * one member with two ranged reads (EOCD+CD, then the member) instead
  * of walking the archive — the right container when a training
  * pipeline needs per-sample random access into shards. Method 0
  * (stored) keeps every payload byte SQL-reproducible; entropy-coded
  * methods (deflate) stay out for the same no-closed-form reason the
  * codec family documents (SURVEY §8, q249).
  *
  * [[ZipBytes]] takes ordered members `array<struct<doc_id: long,
  * text: string>>` and emits, per the spec: one local file header
  * (sig PK\3\4, version 20, flags 0, method 0, DOS time 0 / date
  * 0x0021 = 1980-01-01 for determinism, CRC-32, sizes, name
  * `<doc_id>.txt`) + payload per member, then the central directory
  * (PK\1\2 entries mirroring the local fields + local-header offset),
  * then the 22-byte end-of-central-directory record (PK\5\6, no
  * comment). Every field is fixed, so the archive length has a closed
  * form the oracle checks: Σ(30 + |name| + size) + Σ(46 + |name|) + 22.
  *
  * [[ZipEntries]] is a real walker, not a restatement: it locates the
  * EOCD at the tail (exact length, zero comment), validates the
  * single-disk fields and the CD size/offset tiling
  * (cdOffset + cdSize + 22 == length), then per CD entry validates the
  * local header against the CD copy (signature, name, method, sizes,
  * CRC), recomputes CRC-32 over the stored payload (`crc_ok` — a
  * flipped payload byte flips it), and md5s the payload. Structural
  * non-conformance → NULL; a CRC mismatch is DATA corruption in a
  * well-formed container, so it is REPORTED, not nulled. `java.util
  * .zip.ZipInputStream` reads the builder's bytes back verbatim
  * (spec-driven in ZipCodecSpec). */
case class ZipBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _), StructField(_, StringType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_zip_bytes requires array<struct<long, string>>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zip_bytes"

  override def nullSafeEval(input: Any): Any =
    ZipBytes.build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ZipBytes.build($c);")

  override protected def withNewChildInternal(newChild: Expression): ZipBytes =
    copy(child = newChild)
}

object ZipBytes {
  private val DosDate = 0x0021 // 1980-01-01, the earliest valid DOS date

  /** Public + static-shaped so generated code can call it. */
  def build(members: ArrayData): Array[Byte] = {
    val n = members.numElements()
    val names = new Array[Array[Byte]](n)
    val payloads = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      names(i) = (row.getLong(0).toString + ".txt").getBytes("US-ASCII")
      payloads(i) = row.getUTF8String(1).toString.getBytes("UTF-8")
      i += 1
    }
    assemble(names, payloads)
  }

  /** The spec-conforming archive assembly over raw member arrays —
    * shared by the expression above and the DataSourceV2 writer
    * ([[graft.sources.ZipShardSource]]'s write path). */
  def assemble(names: Array[Array[Byte]],
      payloads: Array[Array[Byte]]): Array[Byte] = {
    val n = names.length
    val crcs = new Array[Long](n)
    var localTotal = 0L
    var cdTotal = 0L
    val crc = new java.util.zip.CRC32
    var i = 0
    while (i < n) {
      crc.reset(); crc.update(payloads(i))
      crcs(i) = crc.getValue
      localTotal += 30L + names(i).length + payloads(i).length
      cdTotal += 46L + names(i).length
      i += 1
    }
    val out = new Array[Byte]((localTotal + cdTotal + 22).toInt)
    var pos = 0
    def le16(v: Int): Unit = {
      out(pos) = (v & 0xff).toByte; out(pos + 1) = ((v >> 8) & 0xff).toByte
      pos += 2
    }
    def le32(v: Long): Unit = {
      out(pos) = (v & 0xff).toByte
      out(pos + 1) = ((v >> 8) & 0xff).toByte
      out(pos + 2) = ((v >> 16) & 0xff).toByte
      out(pos + 3) = ((v >> 24) & 0xff).toByte
      pos += 4
    }
    val offsets = new Array[Long](n)
    i = 0
    while (i < n) {
      offsets(i) = pos
      le32(0x04034b50L)          // local file header signature
      le16(20); le16(0); le16(0) // version needed, flags, method=stored
      le16(0); le16(DosDate)     // mod time 0, mod date 1980-01-01
      le32(crcs(i))
      le32(payloads(i).length.toLong) // compressed size (= stored)
      le32(payloads(i).length.toLong) // uncompressed size
      le16(names(i).length); le16(0)  // name len, extra len
      System.arraycopy(names(i), 0, out, pos, names(i).length)
      pos += names(i).length
      System.arraycopy(payloads(i), 0, out, pos, payloads(i).length)
      pos += payloads(i).length
      i += 1
    }
    val cdOff = pos
    i = 0
    while (i < n) {
      le32(0x02014b50L)          // central directory entry signature
      le16(20); le16(20)         // version made by, version needed
      le16(0); le16(0)           // flags, method
      le16(0); le16(DosDate)
      le32(crcs(i))
      le32(payloads(i).length.toLong)
      le32(payloads(i).length.toLong)
      le16(names(i).length); le16(0); le16(0) // name, extra, comment len
      le16(0); le16(0)           // disk number start, internal attrs
      le32(0L)                   // external attrs
      le32(offsets(i))           // local header offset
      System.arraycopy(names(i), 0, out, pos, names(i).length)
      pos += names(i).length
      i += 1
    }
    le32(0x06054b50L)            // EOCD signature
    le16(0); le16(0)             // this disk, CD start disk
    le16(n); le16(n)             // entries on disk, total entries
    le32(cdTotal)                // CD size
    le32(cdOff.toLong)           // CD offset
    le16(0)                      // comment length
    out
  }
}

case class ZipEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_zip_entries requires a binary input, got $t")
  }
  override def dataType: DataType = ZipEntries.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_entries"

  override def nullSafeEval(input: Any): Any =
    ZipEntries.walk(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.ZipEntries.walk($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
}

object ZipEntries {
  val entrySchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("crc_ok", BooleanType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("n_entries", IntegerType, nullable = false),
    StructField("zip_len", LongType, nullable = false),
    StructField("entries", ArrayType(entrySchema, containsNull = false),
      nullable = false)))

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Full archive walk → entry list in central-directory order, or
    * null for any structurally non-conforming byte (CRC mismatches are
    * reported per entry, not nulled — see the class doc). Public +
    * static-shaped so generated code can call it. */
  def walk(zip: Array[Byte]): InternalRow = {
    if (zip == null || zip.length < 22) return null
    val eocd = zip.length - 22 // builder emits no comment; demand none
    if (le32(zip, eocd) != 0x06054b50L) return null
    if (le16(zip, eocd + 4) != 0 || le16(zip, eocd + 6) != 0) return null
    val n = le16(zip, eocd + 10)
    if (le16(zip, eocd + 8) != n) return null
    val cdSize = le32(zip, eocd + 12)
    val cdOff = le32(zip, eocd + 16)
    if (le16(zip, eocd + 20) != 0) return null
    if (cdOff + cdSize != eocd.toLong) return null
    val crc = new java.util.zip.CRC32
    val md = java.security.MessageDigest.getInstance("MD5")
    val entries = new Array[InternalRow](n)
    var p = cdOff.toInt
    var i = 0
    while (i < n) {
      if (p + 46 > eocd) return null
      if (le32(zip, p) != 0x02014b50L) return null
      if (le16(zip, p + 10) != 0) return null // method: stored only
      val cdCrc = le32(zip, p + 16)
      val csize = le32(zip, p + 20)
      val usize = le32(zip, p + 24)
      if (csize != usize) return null // stored: sizes must agree
      if (usize > (1L << 26)) return null
      val nameLen = le16(zip, p + 28)
      if (le16(zip, p + 30) != 0 || le16(zip, p + 32) != 0) return null
      val localOff = le32(zip, p + 42)
      if (p + 46 + nameLen > eocd) return null
      val name = new String(zip, p + 46, nameLen, "US-ASCII")
      // local header must mirror the CD copy
      val lo = localOff.toInt
      if (localOff < 0 || lo + 30 + nameLen > cdOff) return null
      if (le32(zip, lo) != 0x04034b50L) return null
      if (le16(zip, lo + 8) != 0) return null // method
      if (le32(zip, lo + 14) != cdCrc) return null
      if (le32(zip, lo + 18) != csize || le32(zip, lo + 22) != usize)
        return null
      if (le16(zip, lo + 26) != nameLen || le16(zip, lo + 28) != 0)
        return null
      if (!java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(zip, lo + 30, lo + 30 + nameLen),
          java.util.Arrays.copyOfRange(zip, p + 46, p + 46 + nameLen)))
        return null
      val dataOff = lo + 30 + nameLen
      if (dataOff + usize > cdOff) return null
      crc.reset(); crc.update(zip, dataOff, usize.toInt)
      md.reset(); md.update(zip, dataOff, usize.toInt)
      val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
      entries(i) = new GenericInternalRow(Array[Any](i,
        UTF8String.fromString(name), usize, crc.getValue == cdCrc,
        UTF8String.fromString(hex)))
      p += 46 + nameLen
      i += 1
    }
    if (p.toLong != cdOff + cdSize) return null // CD tiles exactly
    new GenericInternalRow(Array[Any](n, zip.length.toLong,
      new GenericArrayData(entries.toArray[Any])))
  }
}
