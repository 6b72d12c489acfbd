package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** POSIX USTAR tar shard encode/decode as native expressions — the
  * WebDataset contract: large-scale multimodal training data ships as
  * tar shards of per-sample member files, consumed sequentially (no
  * random access, object-store-friendly). The engine side of that
  * contract is exactly what these two expressions pin: group documents
  * into shards, emit a SPEC-CONFORMING archive per shard (real `tar`
  * reads it — the spec drives GNU tar against the bytes), and walk
  * archives back into per-member metadata + content digests without a
  * filesystem round-trip.
  *
  * [[TarBytes]] takes the shard's members as an ordered
  * `array<struct<doc_id: long, text: string>>` and builds: one 512-byte
  * USTAR header per member (name `<doc_id>.txt`, mode 0644, size in
  * octal, mtime 0 for determinism, checksum over the header with the
  * checksum field blanked to spaces, typeflag '0', magic "ustar\0" +
  * version "00"), the UTF-8 payload padded with NULs to a 512 multiple,
  * and the two terminating zero blocks. Every field the spec fixes is
  * fixed, so archive length has a closed form:
  * Σ 512·(1 + ⌈size/512⌉) + 1024 — the oracle checks it.
  *
  * [[TarEntries]] is a real walker, not a restatement: it reads each
  * header, re-derives the checksum from the raw bytes (checksum field
  * as spaces) and compares against the stored octal value, validates
  * magic/version/typeflag, parses the octal size, md5s the member
  * payload, verifies NUL padding and the double zero-block terminator,
  * and returns `(n_entries, tar_len, entries(idx, name, size,
  * payload_md5))` — NULL for ANY non-conforming byte. Member md5 of a
  * UTF-8 text payload equals `md5(text)` in both engines, so member
  * CONTENT is oracle-checkable straight off the documents table.
  */
case class TarBytes(child: Expression, gzipMembers: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _), StructField(_, StringType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    // named-member form: struct<name: string, text: string> — the
    // WebDataset paired-sample convention (`<key>.txt` + `<key>.cls`
    // members adjacent in one shard); names are used verbatim
    case ArrayType(StructType(Array(
        StructField(_, StringType, _, _), StructField(_, StringType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tar_bytes requires array<struct<long, string>> or array<struct<string, string>>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (gzipMembers) "graft_targz_bytes" else "graft_tar_bytes"

  private lazy val namedMembers: Boolean = child.dataType match {
    case ArrayType(StructType(Array(StructField(_, StringType, _, _), _)), _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    TarBytes.build(input.asInstanceOf[ArrayData], gzipMembers, namedMembers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TarBytes.build($c, $gzipMembers, $namedMembers);")

  override protected def withNewChildInternal(newChild: Expression): TarBytes =
    copy(child = newChild)
}

object TarBytes {
  private val Block = 512

  private def gzip(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray // JDK header: MTIME 0, no name — deterministic
  }

  /** Public + static-shaped so generated code can call it. */
  def build(members: ArrayData, gzipMembers: Boolean,
      namedMembers: Boolean = false): Array[Byte] = {
    val n = members.numElements()
    var total = 2 * Block
    val payloads = new Array[Array[Byte]](n)
    val names = new Array[String](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      val raw = row.getUTF8String(1).toString.getBytes("UTF-8")
      names(i) =
        if (namedMembers) {
          val nm = row.getUTF8String(0).toString
          require(nm.nonEmpty && nm.length <= 100 &&
            nm.forall(c => c > 0 && c < 128),
            s"tar member name must be 1-100 ASCII chars, got '$nm'")
          // Names are written verbatim into tar headers; a '/'-bearing or
          // dot-segment name would become a path-traversal member when the
          // shard is extracted by a standard tar tool. WebDataset keys are
          // flat ("<key>.<ext>") and never need separators, so reject
          // rather than sanitize.
          require(!nm.contains('/') && nm != "." && nm != "..",
            s"tar member name must be a flat filename (no '/' or dot segments), got '$nm'")
          nm
        } else row.getLong(0).toString +
          (if (gzipMembers) ".txt.gz" else ".txt")
      payloads(i) = if (gzipMembers) gzip(raw) else raw
      total += Block + ((payloads(i).length + Block - 1) / Block) * Block
      i += 1
    }
    val out = new Array[Byte](total)
    var pos = 0
    def ascii(off: Int, s: String): Unit = {
      var j = 0
      while (j < s.length) { out(off + j) = s.charAt(j).toByte; j += 1 }
    }
    i = 0
    while (i < n) {
      val h = pos
      ascii(h, names(i))                       // name[100]
      ascii(h + 100, "0000644")                // mode[8], NUL-terminated
      ascii(h + 108, "0000000")                // uid[8]
      ascii(h + 116, "0000000")                // gid[8]
      ascii(h + 124, f"${payloads(i).length}%011o") // size[12]
      ascii(h + 136, "00000000000")            // mtime[12]: 0, deterministic
      java.util.Arrays.fill(out, h + 148, h + 156, ' '.toByte) // chksum blank
      out(h + 156) = '0'                       // typeflag: regular file
      ascii(h + 257, "ustar")                  // magic[6] ends in NUL (already 0)
      ascii(h + 263, "00")                     // version[2]
      var sum = 0L
      var j = h
      while (j < h + Block) { sum += out(j) & 0xff; j += 1 }
      ascii(h + 148, f"$sum%06o")              // chksum: 6 octal + NUL + space
      out(h + 154) = 0
      out(h + 155) = ' '.toByte
      pos += Block
      System.arraycopy(payloads(i), 0, out, pos, payloads(i).length)
      pos += ((payloads(i).length + Block - 1) / Block) * Block
      i += 1
    }
    out // final 1024 bytes stay zero: the terminator blocks
  }
}

case class TarEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tar_entries requires a binary input, got $t")
  }
  override def dataType: DataType = TarEntries.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_entries"

  override def nullSafeEval(input: Any): Any =
    TarEntries.walk(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.expressions.TarEntries.walk($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TarEntries =
    copy(child = newChild)
}

object TarEntries {
  private val Block = 512

  val entrySchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false),
    // CONTENT view: for `.gz` members the member bytes are inflated
    // (GZIP CRC verified) and digested — compressed bytes have no SQL
    // closed form but the content does; for plain members these equal
    // (size, payload_md5)
    StructField("content_size", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("n_entries", IntegerType, nullable = false),
    StructField("tar_len", LongType, nullable = false),
    StructField("entries", ArrayType(entrySchema, containsNull = false),
      nullable = false)))

  private def allZero(b: Array[Byte], off: Int, len: Int): Boolean = {
    var i = off
    while (i < off + len) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Full archive walk → entry list, or null for any non-conforming
    * byte. Public + static-shaped so generated code can call it. */
  def walk(tar: Array[Byte]): InternalRow = {
    if (tar == null || tar.length < 2 * Block || tar.length % Block != 0)
      return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val entries = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pos = 0
    var terminated = false
    while (!terminated) {
      if (pos + 2 * Block > tar.length) return null
      if (allZero(tar, pos, Block)) {
        // terminator: second zero block, then nothing (no slack)
        if (!allZero(tar, pos + Block, Block)) return null
        if (pos + 2 * Block != tar.length) return null
        terminated = true
      } else {
        // magic "ustar\0" + version "00", regular-file typeflag
        val magicOk = tar(pos + 257) == 'u' && tar(pos + 258) == 's' &&
          tar(pos + 259) == 't' && tar(pos + 260) == 'a' &&
          tar(pos + 261) == 'r' && tar(pos + 262) == 0 &&
          tar(pos + 263) == '0' && tar(pos + 264) == '0'
        if (!magicOk || tar(pos + 156) != '0') return null
        // stored checksum (octal, NUL/space-terminated)
        var stored = 0L
        var j = pos + 148
        while (j < pos + 156 && tar(j) >= '0' && tar(j) <= '7') {
          stored = stored * 8 + (tar(j) - '0'); j += 1
        }
        // recompute with the checksum field as spaces
        var sum = 0L
        j = pos
        while (j < pos + Block) {
          val v = if (j >= pos + 148 && j < pos + 156) ' '.toInt
            else tar(j) & 0xff
          sum += v; j += 1
        }
        if (sum != stored) return null
        var nameEnd = pos
        while (nameEnd < pos + 100 && tar(nameEnd) != 0) nameEnd += 1
        val name = new String(tar, pos, nameEnd - pos, "US-ASCII")
        var size = 0L
        j = pos + 124
        while (j < pos + 136 && tar(j) >= '0' && tar(j) <= '7') {
          size = size * 8 + (tar(j) - '0'); j += 1
        }
        // bound before any allocation-sized use (adversarial headers
        // must not drive the walk or the digest past the array)
        if (size < 0 || size > (1 << 26)) return null
        val padded = ((size + Block - 1) / Block) * Block
        if (pos + Block + padded > tar.length) return null
        md.reset()
        md.update(tar, pos + Block, size.toInt)
        val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
        // NUL padding after the payload, as the builder (and spec) emit
        if (!allZero(tar, pos + Block + size.toInt, (padded - size).toInt))
          return null
        val (contentSize, contentHex) =
          if (name.endsWith(".gz")) {
            val inflated = try {
              val in = new java.util.zip.GZIPInputStream(
                new java.io.ByteArrayInputStream(tar, pos + Block, size.toInt))
              val bos = new java.io.ByteArrayOutputStream(size.toInt * 2 + 64)
              val buf = new Array[Byte](4096)
              var read = 0
              var totalOut = 0L
              while ({ read = in.read(buf); read >= 0 }) {
                totalOut += read
                if (totalOut > (1 << 26)) return null // decompression bomb
                bos.write(buf, 0, read)
              }
              bos.toByteArray
            } catch { case _: java.io.IOException => return null } // bad CRC/stream
            md.reset()
            (inflated.length.toLong,
              md.digest(inflated).map(b => f"${b & 0xff}%02x").mkString)
          } else (size, hex)
        entries += new GenericInternalRow(Array[Any](entries.length,
          UTF8String.fromString(name), size, UTF8String.fromString(hex),
          contentSize, UTF8String.fromString(contentHex)))
        pos += Block + padded.toInt
      }
    }
    new GenericInternalRow(Array[Any](entries.length, tar.length.toLong,
      new GenericArrayData(entries.toArray[Any])))
  }
}
