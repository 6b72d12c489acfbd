package graft.sources

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for PKZIP stored-method shard directories (one
  * `.zip` per shard, written by [[graft.expressions.ZipBytes]] — see
  * `ZipCodec.scala`): the RANDOM-ACCESS counterpart of
  * [[TarShardSource]]. A tar scan must walk the whole archive even for
  * a name listing; a zip carries its catalog in the central directory
  * at the TAIL, so this reader does what an object-store range reader
  * would:
  *
  *   - a MANIFEST scan (no `text`/`payload_md5` projected) reads ONLY
  *     the 22-byte EOCD plus the central directory — two ranged reads
  *     per shard, independent of payload volume;
  *   - a payload projection seeks exactly the selected members' local
  *     ranges (CD-filtered by the pushed `name` prefix BEFORE any
  *     payload byte moves);
  *   - `shard_file = 'x'` prunes FILES at planning time (conjunctive:
  *     two distinct values plan zero partitions — the TarShardSource
  *     contract).
  *
  * The ranged-read discipline is not just narrated — every byte the
  * reader pulls is counted ([[ZipShardSource.bytesRead]], test-only
  * telemetry reset per scan by ZipDsv2Spec), and the spec asserts a
  * manifest scan reads catalog-sized, not archive-sized, volume.
  * Structural corruption (bad EOCD/CD/local signatures, sizes past
  * bounds) hard-fails like every reader in this engine. */
class ZipShardSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zip"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipShardTable.schema
  // writes carry their own (doc_id, text) schema — validated by the
  // WriteBuilder, not by equality with the read schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZipShardTable(properties.get("path"))
}

object ZipShardSource {
  /** Total bytes pulled through ranged reads, across all readers in
    * this JVM — test-only telemetry for the spec's "manifest scans are
    * catalog-sized" assertion. Not part of the scan contract. */
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
}

object ZipShardTable {
  val schema: StructType = StructType(Seq(
    StructField("shard_file", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("crc32", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))
}

class ZipShardTable(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-zip `$path`"
  override def schema(): StructType = ZipShardTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      // the write schema is (doc_id, text), not the read schema —
      // the WriteBuilder enforces it
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(Option(options.get("path")).getOrElse(path))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ZipWriteBuilder(
      Option(info.options.get("path")).getOrElse(path), info.schema(),
      info.queryId())
}

/** WRITE path: `df.select(doc_id, text).write.format("graft-zip")`
  * emits one spec-conforming `.zip` shard PER PARTITION (members
  * sorted by doc_id — the q157/q414 deterministic-order convention),
  * through a real two-phase commit: each task writes
  * `_tmp-part-NNNNN-<taskId>.zip` and only the driver-side job commit
  * renames the temps into place (`part-NNNNN-<queryId>.zip` — the
  * query id makes part names job-unique, so a second append can never
  * overwrite an earlier job's shards on a colliding partition id); an
  * aborted task deletes its temp, an aborted job sweeps its OWN temps
  * (scoped by query id — a concurrent job's in-flight temps are not
  * touched) — so readers never observe a torn shard. Shard contract:
  * one task's members must fit a shard (the collect_list analogue —
  * partition BEFORE writing, e.g. `repartitionByRange($"doc_id")`).
  * Append mode only adds new part files; SaveMode.Overwrite maps to
  * TRUNCATE, which clears prior `part-*.zip`.
  *
  * Concurrency contract: the queryId scoping above makes APPEND safe
  * under concurrent writers (distinct part names, aborts sweep only
  * their own temps). OVERWRITE is exclusive — its TRUNCATE clears every
  * committed `part-*.zip` in the directory, including shards a
  * concurrent append just landed. Run Overwrite only with no other
  * writer on the same path. */
class ZipWriteBuilder(path: String, schema: StructType, queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  require(schema.fieldNames.toSeq == Seq("doc_id", "text") &&
    schema.fields(0).dataType == LongType &&
    schema.fields(1).dataType == StringType,
    s"graft-zip writes struct<doc_id: bigint, text: string>, got $schema")
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new ZipBatchWrite(path, doTruncate, queryId)
    }
}

class ZipBatchWrite(path: String, truncate: Boolean, queryId: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    new ZipWriterFactory(path, queryId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncate)
      Files.list(Paths.get(path)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".zip"))
        .foreach(Files.delete)
    messages.collect { case ZipCommitMessage(tmp, fin) =>
      Files.move(Paths.get(tmp), Paths.get(fin),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // sweep only THIS job's temps (suffixed with our queryId) — a
    // concurrent job's in-flight temps must survive our abort
    Files.list(Paths.get(path)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("_tmp-") && n.endsWith(s"-$queryId.zip")
      }
      .foreach(p => try Files.delete(p) catch { case _: Exception => () })
}

case class ZipCommitMessage(tmp: String, fin: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class ZipWriterFactory(path: String, queryId: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new ZipDataWriter(path, partitionId, taskId, queryId)
}

class ZipDataWriter(path: String, partitionId: Int, taskId: Long,
    queryId: String) extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val rows =
    scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
  private val tmp =
    Paths.get(path, f"_tmp-part-$partitionId%05d-$taskId-$queryId.zip").toString
  // job-unique final name: two appends to one directory must never
  // collide on partition id (the old part-NNNNN.zip scheme silently
  // overwrote the first job's shards via REPLACE_EXISTING)
  private val fin =
    Paths.get(path, f"part-$partitionId%05d-$queryId.zip").toString

  override def write(record: InternalRow): Unit =
    rows += ((record.getLong(0),
      record.getUTF8String(1).toString.getBytes("UTF-8")))

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    val sorted = rows.sortBy(_._1).toArray
    val bytes = graft.expressions.ZipBytes.assemble(
      sorted.map(r => (r._1.toString + ".txt").getBytes("US-ASCII")),
      sorted.map(_._2))
    Files.write(Paths.get(tmp), bytes)
    ZipCommitMessage(tmp, fin)
  }

  override def abort(): Unit =
    try Files.deleteIfExists(Paths.get(tmp)) catch { case _: Exception => () }
  override def close(): Unit = ()
}

class ZipScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = ZipShardTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = if (requiredSchema.isEmpty)
      StructType(ZipShardTable.schema.take(2)) else requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("shard_file", _: String) => true
      case StringStartsWith("name", _) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new ZipScan(path, required, pushed)
}

class ZipScan(path: String, required: StructType, filters: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-zip path=$path pruned=[${required.fieldNames.mkString(",")}]" +
      s" pushed=[${filters.mkString(",")}]"

  private def keptFiles(): Array[String] = {
    val fileEq = filters.collect {
      case EqualTo("shard_file", v: String) => v
    }.toSet
    // hidden-file convention: names starting with '_' or '.' are never
    // data — a crashed job (driver death skips BatchWrite.abort) can
    // leave `_tmp-part-*` temps behind, and a scan that picked them up
    // would double-count rows or hard-fail on a torn shard
    val files = Files.list(Paths.get(path)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".zip") && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.toString).toArray.sorted
    // conjunctive EqualTo semantics — the TarShardSource contract
    if (fileEq.isEmpty) files
    else if (fileEq.size > 1) Array.empty[String]
    else files.filter(f => Paths.get(f).getFileName.toString == fileEq.head)
  }

  override def planInputPartitions(): Array[InputPartition] =
    keptFiles().map(f => ZipInputPartition(f): InputPartition)

  /** Post-pruning DATA bytes so the optimizer sees a REAL size for
    * this scan — a one-shard manifest joins broadcast instead of the
    * conservative-default sort-merge. Raw archive size under-reports
    * what the scan EMITS (decoded text rows are bigger than their
    * on-disk bytes, and upstream FileScan applies a compression factor
    * for exactly this reason), so the estimate sums the UNCOMPRESSED
    * entry sizes the central directory already stores (one EOCD+CD
    * ranged read per shard at planning time — the same two reads the
    * partition reader pays anyway) plus a per-row name/struct
    * overhead. A structurally surprising shard falls back to its raw
    * size; the reader is the strict validator, statistics must not
    * hard-fail planning. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = keptFiles()
      .map(f => ZipScan.estimatedDataBytes(f)).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipReaderFactory(required, filters)
}

object ZipScan {
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Per-entry overhead of the EMITTED manifest row beyond the text
    * payload: the 32-char payload_md5 hex string (not stored in the
    * archive at all), five fixed-width columns (idx, size, crc, off ≈
    * 40 bytes), and the row header (~16) — the name string is added
    * per entry. Chosen from the row schema, not tuned: the point is
    * that the estimate tracks what the scan PRODUCES, while the raw
    * archive adds ~76 + 2·nameLen of LOC/CD framing per entry that
    * never reaches a row. For stored-method archives the two are
    * close by construction; they diverge exactly when framing
    * overhead and row overhead differ, which is what the optimizer
    * should see (the estimate may legitimately land BELOW the raw
    * archive size — the raw size is only the structural-surprise
    * fallback). */
  private val RowOverheadBytes = 88L

  /** Planning-time size of the ROW DATA a shard will emit: Σ
    * (uncompressed entry size + name + [[RowOverheadBytes]]) from the
    * central directory — NOT the raw archive size, which counts
    * LOC/CD/EOCD framing the scan never emits and misses the
    * md5-hex/struct bytes it does. Tolerant by design (falls back to
    * raw size on any structural surprise) — strict validation is the
    * reader's job. */
  def estimatedDataBytes(f: String): Long = {
    val raw = Files.size(Paths.get(f))
    try {
      val ch = FileChannel.open(Paths.get(f), StandardOpenOption.READ)
      try {
        val flen = ch.size()
        if (flen < 22) return raw
        def read(at: Long, len: Int): Array[Byte] = {
          val buf = ByteBuffer.allocate(len)
          var off = at
          while (buf.hasRemaining) {
            val n = ch.read(buf, off)
            if (n < 0) throw new java.io.EOFException()
            off += n
          }
          buf.array()
        }
        val eocd = read(flen - 22, 22)
        if (le32(eocd, 0) != 0x06054b50L) return raw
        val n = le16(eocd, 10)
        val cdSize = le32(eocd, 12)
        val cdOff = le32(eocd, 16)
        if (cdOff + cdSize + 22 != flen) return raw
        val cd = read(cdOff, cdSize.toInt)
        var p = 0
        var i = 0
        var sum = 0L
        while (i < n) {
          if (p + 46 > cd.length || le32(cd, p) != 0x02014b50L) return raw
          val usize = le32(cd, p + 24)
          val nameLen = le16(cd, p + 28)
          // extra-field + file-comment lengths participate in the CD
          // record size even though the engine's own writer emits
          // neither — external tools (zip64, UT timestamps) routinely
          // do, and skipping only 46+nameLen would break the next
          // signature check and silently fall back to the raw size
          val extraLen = le16(cd, p + 30)
          val commentLen = le16(cd, p + 32)
          sum += usize + nameLen + RowOverheadBytes
          p += 46 + nameLen + extraLen + commentLen
          i += 1
        }
        sum
      } finally ch.close()
    } catch { case _: Throwable => raw }
  }
}

case class ZipInputPartition(file: String) extends InputPartition

class ZipReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ZipPartitionReader(p.asInstanceOf[ZipInputPartition].file,
      required, filters)
}

class ZipPartitionReader(file: String, required: StructType,
    filters: Array[Filter]) extends PartitionReader[InternalRow] {
  private val fname = Paths.get(file).getFileName.toString
  private val prefixes = filters.collect {
    case StringStartsWith("name", p) => p
  }
  private val needPayload =
    required.fieldNames.contains("payload_md5") ||
      required.fieldNames.contains("text")

  private def fail(msg: String): Nothing =
    throw new java.io.IOException(s"graft-zip $fname: $msg")

  private val ch =
    FileChannel.open(Paths.get(file), StandardOpenOption.READ)

  /** One accounted ranged read. */
  private def rangeRead(at: Long, len: Int): Array[Byte] = {
    if (at < 0 || at + len > ch.size()) fail(s"range [$at, +$len) past EOF")
    val buf = ByteBuffer.allocate(len)
    var off = at
    while (buf.hasRemaining) {
      val n = ch.read(buf, off)
      if (n < 0) fail("unexpected EOF")
      off += n
    }
    ZipShardSource.bytesRead.addAndGet(len.toLong)
    buf.array()
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  // ranged read #1: the EOCD (builder writes no comment); #2: the CD
  private val (entries, cdOffForBound) = {
    val flen = ch.size()
    if (flen < 22) fail("shorter than an EOCD")
    val eocd = rangeRead(flen - 22, 22)
    if (le32(eocd, 0) != 0x06054b50L) fail("bad EOCD signature")
    if (le16(eocd, 20) != 0) fail("unexpected archive comment")
    val n = le16(eocd, 10)
    val cdSize = le32(eocd, 12)
    val cdOff = le32(eocd, 16)
    if (cdOff + cdSize + 22 != flen) fail("CD does not tile the archive")
    val cd = rangeRead(cdOff, cdSize.toInt)
    val out = new Array[(String, Long, Long, Long, Int)](n) // name, size, crc, localOff, nameLen
    var p = 0
    var i = 0
    while (i < n) {
      if (p + 46 > cd.length) fail("truncated central directory")
      if (le32(cd, p) != 0x02014b50L) fail("bad CD entry signature")
      if (le16(cd, p + 10) != 0) fail("non-stored method")
      val crc = le32(cd, p + 16)
      val csize = le32(cd, p + 20)
      val usize = le32(cd, p + 24)
      if (csize != usize) fail("stored sizes disagree")
      if (usize > (1L << 26)) fail(s"entry size $usize out of bounds")
      val nameLen = le16(cd, p + 28)
      if (le16(cd, p + 30) != 0 || le16(cd, p + 32) != 0)
        fail("unexpected extra/comment field")
      val localOff = le32(cd, p + 42)
      if (p + 46 + nameLen > cd.length) fail("truncated central directory")
      val name = new String(cd, p + 46, nameLen, "US-ASCII")
      out(i) = (name, usize, crc, localOff, nameLen)
      p += 46 + nameLen
      i += 1
    }
    if (p != cd.length) fail("central directory does not tile")
    (out, cdOff)
  }

  private var cursor = -1
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (cursor + 1 < entries.length) {
      cursor += 1
      val (name, size, crc, localOff, nameLen) = entries(cursor)
      if (prefixes.forall(name.startsWith)) {
        current = buildRow(name, size, crc, localOff, nameLen)
        return true
      }
    }
    false
  }

  private def buildRow(name: String, size: Long, crc: Long,
      localOff: Long, nameLen: Int): InternalRow = {
    // payload columns: one ranged read of the local header (verify the
    // CD's framing — extra-field length is the local header's to
    // declare) + one of the member bytes; manifest columns touch none
    lazy val payload: Array[Byte] = {
      val lh = rangeRead(localOff, 30)
      if (le32(lh, 0) != 0x04034b50L) fail("bad local header signature")
      if (le16(lh, 26) != nameLen) fail("local/CD name length mismatch")
      val extraLen = le16(lh, 28)
      if (localOff + 30 + nameLen + extraLen + size > cdOffForBound)
        fail("payload past the central directory")
      rangeRead(localOff + 30 + nameLen + extraLen, size.toInt)
    }
    val vals: Array[Any] = required.fieldNames.map {
      case "shard_file" => UTF8String.fromString(fname)
      case "idx" => cursor
      case "name" => UTF8String.fromString(name)
      case "size" => size
      case "crc32" => crc
      case "payload_md5" =>
        val md = java.security.MessageDigest.getInstance("MD5")
        UTF8String.fromString(
          md.digest(payload).map(b => f"$b%02x").mkString)
      case "text" => UTF8String.fromBytes(payload)
      case other => fail(s"unknown column $other")
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ch.close()
  locally { val _ = needPayload }
}
