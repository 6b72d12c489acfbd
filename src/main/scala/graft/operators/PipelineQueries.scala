package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{TextFunctions => T}

/** Training-data pipeline queries (dedup / similarity / text analysis)
  * over the `documents` and `embeddings` tables — the extension surface
  * mandated by BASELINE.json's north star.
  */
object PipelineQueries {

  // exact dedup — hash-groupBy on normalized fingerprint
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("fp")

  // token counting
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        T.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  // quality scoring — repetition / token-shape / stopword signals
  def quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        T.uniqueTokenRatio(col("text")).as("uniq_ratio"),
        T.meanTokenLength(col("text")).as("mean_tok_len"),
        T.stopwordRatio(col("text")).as("stopword_ratio"),
        T.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  // language-ID heuristic (stopword-profile argmax)
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), T.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  // document fingerprinting — md5 (normalized) + sha256 (raw)
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        T.fingerprint(col("text")).as("fp"),
        sha2(col("text"), 256).as("sha"))
      .orderBy("doc_id")

  // rolling-hash fingerprint (order-sensitive; rows-only check)
  def rollingFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), T.rollingHash(col("text")).as("rhash"))
      .orderBy("doc_id")

  // MinHash signature digest per doc (rows-only check: deterministic
  // pipeline smoke over signatures without SQL-expressible oracle)
  def minhashSig(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashSignatures(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), xxhash64(col("sig")).as("sig_hash"))
      .orderBy("doc_id")

  // MinHash-LSH near-dup: top candidate pairs by verified Jaccard
  def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text")
    val cands = Dedup.lshCandidatePairs(Dedup.lshBuckets(sigs, "doc_id", 16), "doc_id")
    Dedup.verifyJaccard(cands, docs, "doc_id", "text", 3, 0.0)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  // SimHash fingerprints (rows-only)
  def simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHash(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  // n-gram Jaccard pairs via inverted index (rows-only; top-20)
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, threshold = 0.0, maxDf = 50)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(20)

  // brute-force cosine top-k (exact baseline; DuckDB-oracled on rank)
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.cosineTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), k = 5)
      .orderBy("query_id", "rnk")
  }

  // LSH-bucketed ANN (scale path; rows-only)
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.annTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), k = 5)
      .orderBy("query_id", "rnk")
  }

  // embedding cosine near-dup pairs (rows-only; top-20 by cosine)
  def cosineNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDup(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = -1.0)
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(20)
}
