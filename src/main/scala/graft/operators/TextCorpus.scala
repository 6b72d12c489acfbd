package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{MysqlFunctions, TextFunctions}

/** Corpus-level text statistics — operators whose weights depend on the
  * whole corpus, not a single document (unlike
  * [[graft.functions.TextFunctions]]' per-row expressions).
  */
object TextCorpus {

  /** Top-k terms per document by smoothed TF-IDF:
    * `tf(t,d) · (ln((N+1)/(df(t)+1)) + 1)` (the sklearn-style smoothing
    * that keeps corpus-wide terms finite), ranked per doc by
    * (tfidf desc, term asc) — fully deterministic, and exactly
    * reproducible in SQL (ranking compares the 4-dp ROUNDED score, so
    * last-ulp `ln` differences between engines cannot flip ranks).
    *
    * Scale shape: tokenize+explode → per-(doc,term) counts (map-side
    * combined, one shuffle on (doc,term)), document frequencies from
    * the tf table (one shuffle on term), corpus size N as a broadcast
    * 1-row aggregate (no driver action), per-doc top-k window
    * partitioned by doc. No step materializes anything doc-count² or
    * vocabulary-sized on one node.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", MysqlFunctions.oracleRound(
        col("tf") * (log((col("__n") + lit(1.0)) / (col("df") + lit(1.0)))
          + lit(1.0)), 4))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tfidf"), col("rnk"))
  }
}
