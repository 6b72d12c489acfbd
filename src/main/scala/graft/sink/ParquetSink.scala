package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-pruned parquet output layout — the output-side twin of
  * source bucketing (`sources/Bucketing.scala`): write a DataFrame
  * hive-partitioned by low-cardinality columns so downstream readers
  * prune whole directories at planning time (a `lang = 'en'` filter
  * never lists, let alone scans, the other languages).
  *
  * The small-files guard is the load-bearing part at cluster scale: a
  * naive `partitionBy` write emits one file per (task, value) pair —
  * 1000 tasks × 100 values = 100k files per write, the classic
  * metadata killer for any subsequent listing. `compact = true`
  * repartitions by the partition columns first, collapsing the output
  * to one file per value (right for dimension-ish layouts); leave it
  * false when single partitions are task-sized or bigger and
  * per-partition write parallelism matters more than file count.
  */
object ParquetSink {

  /** Write `df` under `path` hive-partitioned by `partitionCols`.
    * Refuses layouts with more than `maxPartitions` distinct partition
    * values (one extra aggregate pass — cheap next to the write; pass
    * `maxPartitions = 0` to skip the check when the cardinality is
    * known-bounded): a runaway-cardinality partition column (a
    * timestamp, an id) silently degrades every future read, so it
    * should fail loudly at write time. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], compact: Boolean = true,
      maxPartitions: Long = 10000L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"partition columns not in schema: $missing")
    if (maxPartitions > 0) {
      val n = df.select(partitionCols.map(col): _*).distinct().count()
      require(n <= maxPartitions,
        s"$n distinct partition values exceed maxPartitions=$maxPartitions" +
          " — this layout would degrade every downstream read")
    }
    val out = if (compact) df.repartition(partitionCols.map(col): _*) else df
    out.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)
  }
}
