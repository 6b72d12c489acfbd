package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.MysqlFunctions

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the 100 TB scale path.
  *
  * Vector math uses `zip_with`/`aggregate` higher-order functions —
  * sequential fold per row, deterministic, no UDF. At cluster scale the
  * brute-force path broadcasts the (small) query set and makes one pass
  * over the corpus; the LSH path turns the corpus pass into a bucket
  * hash-join.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (broadcast side); the corpus is
    * scanned once, then a per-query top-k window runs on the
    * |corpus|×|queries| score rows. Ranks are deterministic (ties broken
    * by neighbor id).
    */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cvec"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** Deterministic random hyperplanes: weight(plane p, dim d) derived
    * from a seeded RNG — reproducible across runs/sessions. */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-random-projection bucket id: `numPlanes`-bit key where bit p =
    * sign(vec · plane_p). Cosine-similar vectors collide with high
    * probability. */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(numPlanes, dim, seed)
    (0 until numPlanes).map { p =>
      val plane = array(ps(p).map(lit): _*)
      when(dot(vec, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k: candidates restricted to the query's LSH bucket, then
    * exact cosine rank within the bucket. One hash join on the bucket
    * key instead of a full corpus scan per query — the scale path.
    * Recall is tunable via numPlanes (fewer planes → bigger buckets →
    * higher recall, more compute).
    */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int, numPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), numPlanes, dim))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), numPlanes, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** Embedding near-duplicate pairs: corpus self-pairing within LSH
    * buckets, keep pairs with cosine ≥ threshold. */
  def cosineNearDup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), numPlanes, dim))
    val a = c.select(col("bucket"), col("__id").as("id_a"), col("vec").as("vec_a"))
    val b = c.select(col("bucket"), col("__id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", MysqlFunctions.oracleRound(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
