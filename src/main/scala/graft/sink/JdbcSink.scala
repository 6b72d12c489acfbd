package graft.sink

import org.apache.spark.sql.DataFrame
import graft.sources.JdbcConfig

/** JDBC egress — the write half of `sources/JdbcSource`: batched
  * INSERTs through Spark's JDBC writer with the two knobs that matter
  * against a real database: `batchsize` (rows per round trip — the
  * difference between 60k single-row INSERTs and 60 batches) and a
  * CONNECTION CAP — a wide upstream shuffle would otherwise open one
  * connection per partition and stampede the database, so the frame is
  * coalesced down to the config's `numPartitions` before the write
  * (coalesce, not repartition: narrowing needs no extra shuffle).
  *
  * Mirrors the reference's write topology in reverse: where the
  * reference round-trips CSVs into MySQL by hand, a Spark pipeline
  * lands results straight back in the warehouse.
  */
object JdbcSink {

  /** Write `df` into `table`. `mode` is Spark's SaveMode name
    * ("append" into an existing table — the safe default against a
    * production schema — or "overwrite" to let Spark re-create it).
    * The connection cap is the writer's own `numPartitions` option —
    * Spark coalesces wider frames down to it before opening
    * connections. */
  def write(df: DataFrame, cfg: JdbcConfig, table: String,
      mode: String = "append", batchSize: Int = 1000): Unit = {
    require(batchSize > 0, "batchSize must be positive")
    df.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", batchSize)
      .option("numPartitions", cfg.numPartitions)
      .mode(mode)
      .save()
  }
}
