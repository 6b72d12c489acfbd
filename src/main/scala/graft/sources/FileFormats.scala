package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL and ORC ingress/egress — the interchange formats a pipeline
  * meets beside parquet/CSV/JDBC: JSONL for raw crawl/API drops, ORC
  * for warehouse interop. Thin by design (Spark's readers already
  * scale: splittable files, partition discovery, predicate pushdown
  * for ORC), with two engine contracts pinned on top:
  *
  *  - JSONL reads REQUIRE an explicit schema. Schema inference runs a
  *    whole extra pass over the data (a full scan before the real one —
  *    at 100 TB that doubles the job) and silently widens types on
  *    dirty rows; a declared `StructType` keeps the scan single-pass
  *    and the corrupt-row policy explicit (`mode`: PERMISSIVE puts
  *    broken rows' text in `_corrupt_record` if the schema declares
  *    it, DROPMALFORMED drops them, FAILFAST aborts).
  *  - Writers take an explicit partition-count cap the same way
  *    [[graft.sink.ParquetSink]] does — format converters are where
  *    accidental 32k-small-file layouts come from.
  */
object FileFormats {

  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  def writeJsonl(df: DataFrame, path: String,
      maxPartitions: Int = 200): DataFrame = {
    // coalesce caps, never raises — fewer-partition inputs pass through
    df.coalesce(maxPartitions).write.mode("overwrite").json(path)
    df
  }

  /** XML ingress (Spark 4 built-in XML source). Same explicit-schema
    * contract as [[readJsonl]] — inference would burn a second full
    * pass and widen types on dirty rows — plus the `rowTag` that tells
    * the splitter which element starts a record (XML files are only
    * splittable because the reader scans for the row tag). */
  def readXml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String, mode: String = "FAILFAST"): DataFrame =
    spark.read.format("xml").schema(schema)
      .option("rowTag", rowTag).option("mode", mode).load(path)

  /** XML egress with the partition-count cap; `rowTag`/`rootTag` name
    * the record and document elements. */
  def writeXml(df: DataFrame, path: String, rowTag: String,
      rootTag: String, maxPartitions: Int = 200): DataFrame = {
    df.coalesce(maxPartitions).write.mode("overwrite").format("xml")
      .option("rowTag", rowTag).option("rootTag", rootTag).save(path)
    df
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      maxPartitions: Int = 200): DataFrame = {
    df.coalesce(maxPartitions).write.mode("overwrite").orc(path)
    df
  }
}
