package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for WARC shard directories (one `.warc` per
  * shard, records written by [[graft.expressions.WarcBytes]] — see
  * `WarcCodec.scala`): the crawl-native container surfaced as a TABLE,
  * the ingestion shape a Common-Crawl-style corpus actually has — a
  * directory of WARC files scanned shard-parallel, filtered by record
  * type, with payload work done only when the payload is projected.
  *
  * Spark-native scan contract (the [[TarShardSource]] trio-mate):
  *   - one `InputPartition` per shard file — shard-parallel, no
  *     driver-side payload movement;
  *   - `SupportsPushDownRequiredColumns`: `payload_md5`/`text` are
  *     computed ONLY when projected — a manifest scan (type/uri/
  *     offset/length listing) never md5s or UTF-8-decodes a payload;
  *   - `SupportsPushDownFilters`: `shard_file = 'x'` prunes FILES at
  *     planning time (conjunctive — two distinct values plan zero
  *     partitions, the TarShardSource contract) and
  *     `rec_type = 'response'` skips records inside the reader (the
  *     WARC idiom: most consumers want responses only, warcinfo and
  *     request records are framing).
  *
  * The read path trusts the writer's framing the way the tar reader
  * does (full strictness lives in `graft_warc_entries`, q458's gate)
  * but still hard-fails on structural corruption: a damaged version
  * line, a bare LF, a missing Content-Length, or a payload running
  * past EOF.
  */
class WarcShardSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcShardTable.schema
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WarcShardTable(properties.get("path"))
}

object WarcShardTable {
  val schema: StructType = StructType(Seq(
    StructField("shard_file", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("off", LongType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))
}

class WarcShardTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-warc `$path`"
  override def schema(): StructType = WarcShardTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(Option(options.get("path")).getOrElse(path))
}

class WarcScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WarcShardTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = if (requiredSchema.isEmpty)
      StructType(WarcShardTable.schema.take(2)) else requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("shard_file", _: String) => true
      case EqualTo("rec_type", _: String) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new WarcScan(path, required, pushed)
}

class WarcScan(path: String, required: StructType, filters: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-warc path=$path pruned=[${required.fieldNames.mkString(",")}]" +
      s" pushed=[${filters.mkString(",")}]"

  private def keptFiles(): Array[String] = {
    val fileEq = filters.collect {
      case EqualTo("shard_file", v: String) => v
    }.toSet
    val files = Files.list(Paths.get(path)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".warc")).toArray.sorted
    // conjunctive pushed filters: two distinct shard_file equalities
    // can never both hold → zero partitions (the TarShardSource rule)
    if (fileEq.isEmpty) files
    else if (fileEq.size > 1) Array.empty[String]
    else files.filter(f => Paths.get(f).getFileName.toString == fileEq.head)
  }

  override def planInputPartitions(): Array[InputPartition] =
    keptFiles().map(f => WarcInputPartition(f): InputPartition)

  /** Post-pruning archive bytes (and a floor row estimate) so the
    * optimizer sees a REAL size for this scan — a one-shard manifest
    * joins broadcast instead of falling back to the
    * conservative-default sort-merge (the 100 TB join-side decision
    * this source exists to inform). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = keptFiles()
      .map(f => Files.size(Paths.get(f))).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      // ≥ one warcinfo + one response per shard; a real record count
      // would need a file walk at planning time — size is the signal
      // the join planner uses
      java.util.OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, filters)
}

case class WarcInputPartition(file: String) extends InputPartition

class WarcReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcInputPartition].file,
      required, filters)
}

class WarcPartitionReader(file: String, required: StructType,
    filters: Array[Filter]) extends PartitionReader[InternalRow] {
  private val bytes = Files.readAllBytes(Paths.get(file))
  private val fname = Paths.get(file).getFileName.toString
  private val typeEq = filters.collect {
    case EqualTo("rec_type", v: String) => v
  }
  private var pos = 0
  private var idx = -1
  private var current: InternalRow = _

  private def fail(msg: String): Nothing =
    throw new java.io.IOException(s"graft-warc $fname: $msg at offset $pos")

  private def line(p: Int): (String, Int) = {
    var i = p
    while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) {
      if (bytes(i) == '\n') fail("bare LF in header block")
      i += 1
    }
    if (i + 1 >= bytes.length) fail("unterminated header line")
    (new String(bytes, p, i - p, "US-ASCII"), i + 2)
  }

  override def next(): Boolean = {
    while (pos < bytes.length) {
      val off = pos
      val (ver, p0) = line(pos)
      if (ver != "WARC/1.0") fail(s"bad version line '$ver'")
      var p = p0
      var recType: String = null
      var uri: String = null
      var clen = -1L
      var blank = false
      while (!blank) {
        val (l, np) = line(p)
        if (l.isEmpty) blank = true
        else {
          val c = l.indexOf(": ")
          if (c <= 0) fail("malformed header line")
          val k = l.substring(0, c)
          val v = l.substring(c + 2)
          if (k == "WARC-Type") recType = v
          else if (k == "WARC-Target-URI") uri = v
          else if (k == "Content-Length") {
            if (v.isEmpty || !v.forall(_.isDigit) || v.length > 8)
              fail(s"bad Content-Length '$v'")
            clen = v.toLong
          }
        }
        p = np
      }
      if (recType == null) fail("missing WARC-Type")
      if (clen < 0) fail("missing Content-Length")
      if (p + clen + 4 > bytes.length) fail("payload past EOF")
      val t = p + clen.toInt
      if (!(bytes(t) == '\r' && bytes(t + 1) == '\n' &&
        bytes(t + 2) == '\r' && bytes(t + 3) == '\n'))
        fail("missing record terminator")
      pos = t + 4
      idx += 1
      if (typeEq.forall(_ == recType)) {
        current = buildRow(recType, uri, off.toLong, clen, p)
        return true
      }
    }
    false
  }

  private def buildRow(recType: String, uri: String, off: Long,
      clen: Long, at: Int): InternalRow = {
    val vals: Array[Any] = required.fieldNames.map {
      case "shard_file" => UTF8String.fromString(fname)
      case "idx" => idx
      case "rec_type" => UTF8String.fromString(recType)
      case "uri" => if (uri == null) null else UTF8String.fromString(uri)
      case "off" => off
      case "content_length" => clen
      case "payload_md5" =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(bytes, at, clen.toInt)
        UTF8String.fromString(md.digest().map(b => f"$b%02x").mkString)
      case "text" => UTF8String.fromBytes(bytes.slice(at, at + clen.toInt))
      case other => fail(s"unknown column $other")
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
