package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession builder pre-configured the way
  * the engine expects — GraftExtensions registered (native `graft_dot`
  * and `graft_lsh_buckets`; every operator falls back to bit-identical
  * built-in compositions without them, just slower), UTC session time
  * (the oracle/export contract), and shuffle parallelism sized to the
  * worker count instead of Spark's default 200 (right for local and
  * small-cluster runs; raise it with the cluster).
  *
  * `Bench`/`Verify`/`ExportCli` all build their sessions here, so the
  * configuration the gates validate is the configuration users get.
  */
object GraftSession {

  def builder(appName: String, master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")

  /** The harness default: local master with `SPARK_GRAFT_CPUS` threads
    * (`defaultCpus` if unset) and matching shuffle partitions, UI off. */
  def local(appName: String, defaultCpus: String = "32"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = builder(appName, s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The engine's constant-partition windows (rank heads, bucket
    // offsets, n_sources frames) are all provably-bounded single
    // frames — the repartition is the POINT. WindowExec still warns
    // "No Partition Defined" per instance after constant folding
    // empties the partition spec, flooding bench/verify logs (the r8
    // timeout's tail was half this warning); silence exactly that
    // logger, nothing else.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }
}
