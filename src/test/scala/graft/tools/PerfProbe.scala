package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Scratch perf probe for the pair-similarity hot loop (not a test). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val emb = Tables.embeddings(spark, dir)
    // warm
    emb.count()

    val docs = Tables.documents(spark, dir)
    docs.count()
    time("q32 shingle explode only") {
      docs.select(col("doc_id"),
        explode(graft.operators.Dedup.shingles(col("text"), 3)).as("sh")).count()
    }
    time("q32 full pipeline") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.5, maxDf = 50).count()
    }
    time("q30 signatures only") {
      graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text").count()
    }
    time("q30 full pipeline") {
      graft.operators.Dedup.minHashNearDup(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.7).count()
    }

    time("simJoin current (normalized)") {
      Similarity.cosineSimJoin(emb, "vec_id", "embedding", 0.45).count()
    }
    time("simJoin materialized-norm") {
      val n = emb.select(col("vec_id").as("__id"),
        Similarity.normalized(col("embedding").cast("array<double>")).as("nvec"))
        .repartition(32).cache()
      n.count()
      val a = n.select(col("__id").as("id_a"), col("nvec").as("va"))
      val b = n.select(col("__id").as("id_b"), col("nvec").as("vb"))
      val r = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.dotUnrolled(col("va"), col("vb"), 64))
        .filter(col("cos") >= 0.45).count()
      n.unpersist(); r
    }
    time("simJoin raw-dot fold") {
      val n = emb.select(col("vec_id").as("__id"),
        col("embedding").cast("array<double>").as("v"))
      val a = n.select(col("__id").as("id_a"), col("v").as("va"))
      val b = n.select(col("__id").as("id_b"), col("v").as("vb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
        .filter(col("cos") >= 0.45).count()
    }
    spark.stop()
  }
}
