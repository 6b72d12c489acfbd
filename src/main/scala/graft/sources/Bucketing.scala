package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling
  * both sides on the key. Persisting both tables bucketed (and sorted)
  * on that key lets Spark plan a sort-merge join with ZERO exchanges —
  * each task reads matching bucket files from both sides. Use for the
  * stable, repeatedly-joined keys (concept_id-style entity keys, join
  * keys of incremental pipelines); one-off joins should rely on AQE
  * instead. Verified by [[graft.BucketingSpec]]: the join plan over two
  * bucketed tables contains no Exchange.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
