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

  /** Persist `df` as a bucketed, per-bucket-sorted table. Drops any
    * previous incarnation INCLUDING an orphaned warehouse directory —
    * a managed-table location left by an earlier session has no
    * catalog entry in this one, and `saveAsTable` refuses the reused
    * location outright (LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
