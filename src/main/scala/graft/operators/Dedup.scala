package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{MysqlFunctions, TextFunctions}

/** Deduplication operators for large-scale text corpora: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are pure DataFrame
  * pipelines — no driver materialization, no UDFs (everything stays in
  * whole-stage codegen), shuffles only on group/join keys — so they
  * scale horizontally: the only skew hazard is hot LSH buckets /
  * high-document-frequency shingles, which `maxBucket`/`maxDf` caps
  * bound explicitly.
  */
object Dedup {

  /** Materialize a shared intermediate once. Shingling a corpus is a
    * map-only but expensive projection (tokenize + slice + concat per
    * doc); the pair pipelines consume it from 4-7 plan positions (hot
    * set, per-doc sizes, both self-join sides, verification), and
    * without an explicit materialization Catalyst re-evaluates the
    * whole projection at every position. */
  private def materialized(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Exact dedup (hash-groupBy on a normalized fingerprint): one row
    * per distinct content, keeping the minimum id. Single shuffle on
    * the md5 fingerprint — uniform key distribution by construction. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of `text` (n consecutive whitespace tokens,
    * space-joined); documents shorter than n tokens yield one shingle =
    * the whole token sequence. Distinct per document. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signatures: `numHashes` independent min-hashes per doc.
    *
    * Hash family: ONE md5-prefix base hash per shingle, expanded to
    * numHashes values through the affine universal family
    * `h_i = (base·(2i+1) + i·40503) mod (2^31-1)` — 64 multiplications
    * instead of 64 md5 invocations per shingle (the md5-per-seed
    * variant spent ~160M md5 calls at sf0.1), while staying
    * deterministic, free of stored random state, and reproducible in
    * ANSI SQL so the whole LSH pipeline is oracle-verifiable. All
    * intermediates fit a Long under ANSI: base < 2^32, 2i+1 < 2^8 ⇒
    * product < 2^40. Computed as numHashes parallel `min` aggregates
    * over the exploded shingle set (map-side partial agg ⇒ the shuffle
    * carries one row per doc, not per shingle).
    * Returns (idCol, sig array<long>).
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64): DataFrame =
    minHashFromShingleRows(
      df.select(col(idCol),
        explode(shingles(col(textCol), shingleSize)).as("sh")),
      idCol, numHashes)

  /** Signature aggregation over pre-exploded (idCol, sh) rows. */
  private def minHashFromShingleRows(sh: DataFrame, idCol: String,
      numHashes: Int): DataFrame = {
    val based = sh.withColumn("__base", TextFunctions.md5Int(col("sh"), 8))
    val minCols = (0 until numHashes).map(i =>
      min(pmod(col("__base") * lit(2L * i + 1) + lit(i * 40503L),
        lit(2147483647L))).as(s"h$i"))
    based.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of
    * numHashes/bands rows each; band hash = xxhash64 of the slice.
    * Returns (idCol, band, bucket) — one row per (doc, band).
    */
  def lshBuckets(sigs: DataFrame, idCol: String, bands: Int): DataFrame = {
    sigs.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"),
            b * (size(col("sig")) / bands) + 1,
            size(col("sig")) / bands), b))))
      .toDF(idCol, "band", "bucket")
  }

  /** Candidate pairs from LSH buckets: docs sharing any (band, bucket).
    * `maxBucket` drops degenerate hot buckets (e.g. empty-text dupes at
    * 100 TB scale would otherwise produce a quadratic bucket) — dropped
    * buckets are by definition huge duplicate classes better handled by
    * [[exact]] first.
    */
  def lshCandidatePairs(buckets: DataFrame, idCol: String,
      maxBucket: Int = 1000): DataFrame = {
    // Hot-bucket cap via groupBy + broadcast anti-join. The r1 version
    // counted with a Window over every bucket row — a full shuffle+sort
    // of the exploded set. groupBy.count partial-aggregates map-side,
    // and the over-cap set is tiny by construction, so it broadcasts.
    val hot = buckets.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucket)
      .select("band", "bucket")
    val pruned = buckets.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val a = pruned.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = pruned.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the true
    * shingle sets. `candidates(id_a, id_b)`; returns pairs with
    * `jaccard` ≥ threshold. The shingle sets are joined in (two hash
    * joins keyed on doc id), intersected with array ops — no UDF.
    */
  def verifyJaccard(candidates: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleSize: Int, threshold: Double): DataFrame =
    verifyJaccardSets(candidates,
      materialized(df.select(col(idCol).as("__id"),
        shingles(col(textCol), shingleSize).as("__sh"))),
      threshold)

  /** [[verifyJaccard]] over precomputed (materialized) shingle sets
    * `(__id, __sh array<string>)` — lets pipelines shingle the corpus
    * exactly once. */
  def verifyJaccardSets(candidates: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame = {
    candidates
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", MysqlFunctions.oracleRound(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → bands → candidate
    * pairs → exact-Jaccard verify. */
  def minHashNearDup(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    // shingle the corpus ONCE: the array form feeds verification, the
    // exploded form (a cheap explode of the materialized arrays) feeds
    // the signature aggregation
    val sets = materialized(df.select(col(idCol),
      shingles(col(textCol), shingleSize).as("__sh")))
    val sh = sets.select(col(idCol), explode(col("__sh")).as("sh"))
    // signatures feed the hot-bucket count and both self-join sides —
    // materialize once rather than relying on exchange reuse across
    // the three subtrees
    val sigs = materialized(minHashFromShingleRows(sh, idCol, numHashes))
    val cands = lshCandidatePairs(lshBuckets(sigs, idCol, bands), idCol)
    verifyJaccardSets(cands,
      sets.withColumnRenamed(idCol, "__id"), threshold)
  }

  /** SimHash over whitespace tokens: per bit j, sum +1/-1 for each
    * token whose hash has bit j set/clear; bit j of the fingerprint =
    * sign of the sum. `bits` parallel sum-aggregates — one shuffle,
    * map-side combined. The token hash is a 60-bit md5 prefix (15 hex
    * digits) so the whole sketch is reproducible in ANSI SQL; near-dup
    * pairs then compare by hamming distance ([[simHashPairs]]).
    * Documents with no tokens produce no row (no hash evidence).
    */
  val simHashBits = 60
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .withColumn("h", TextFunctions.md5Int(col("t"), 15))
    val bitSums = (0 until simHashBits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until simHashBits).map(j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-dup candidates: block on 4×16-bit chunks (two docs
    * within hamming distance 3 of each other share at least one exact
    * chunk), verify with `bit_count(xor) <= maxHamming`. */
  def simHashPairs(sims: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    val chunked = sims.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .toDF(idCol, "simhash", "chunk", "ckey")
    val a = chunked.select(col("chunk"), col("ckey"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk"), col("ckey"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard similarity via shingle inverted index — no LSH
    * approximation: pairs sharing ≥1 shingle get their exact Jaccard.
    * `maxDf` drops stop-shingles (doc frequency above it) before the
    * pair expansion: at corpus scale a shingle appearing in k docs
    * produces k² pair rows, so frequent shingles must be excluded from
    * *candidate generation* (they still count in verification, which
    * recomputes Jaccard from the full sets).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxDf: Int = 100): DataFrame = {
    // Shingle the corpus ONCE (the expensive tokenize+slice+concat
    // projection): the array form feeds per-doc sizes and verification,
    // the exploded rows (cheap explode of materialized arrays) feed the
    // inverted index.
    val sets = materialized(df.select(col(idCol).as("__id"),
      shingles(col(textCol), shingleSize).as("__sh")))
    val sh = sets.select(col("__id"), explode(col("__sh")).as("sh"))
    // Stop-shingle cap: groupBy doc-frequency + broadcast anti-join of
    // the (small) hot set — replaces the r1 Window-count, which
    // shuffled and sorted every exploded shingle row.
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("sh")
    val rare = sh.join(broadcast(hot), Seq("sh"), "left_anti")
    // Candidate pairs WITH shared-rare-shingle counts (the groupBy
    // replaces a same-cost distinct), then an exactness-preserving
    // count prune before the expensive array_intersect verification:
    // J >= τ requires |A∩B| >= τ(|A|+|B|)/(1+τ), and |A∩B| is at most
    // the shared-rare count plus min(hot_A, hot_B) — random co-occurring
    // pairs (shared count 1-3) fall far below the bound and never reach
    // the verifier.
    val cands = rare.select(col("sh"), col("__id").as("id_a"))
      .join(rare.select(col("sh"), col("__id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__c"))
    val sizes = sets.select(col("__id"), size(col("__sh")).cast("long").as("__sz"))
    val hotPerDoc = sh.join(broadcast(hot), Seq("sh"), "left_semi")
      .groupBy("__id").agg(count(lit(1)).as("__hot"))
    val docStats = sizes.join(hotPerDoc, Seq("__id"), "left")
      .select(col("__id"), col("__sz"), coalesce(col("__hot"), lit(0L)).as("__hot"))
    val pruned = cands
      .join(docStats.select(col("__id").as("id_a"), col("__sz").as("__sa"),
        col("__hot").as("__ha")), Seq("id_a"))
      .join(docStats.select(col("__id").as("id_b"), col("__sz").as("__sb"),
        col("__hot").as("__hb")), Seq("id_b"))
      .filter((col("__c") + least(col("__ha"), col("__hb"))).cast("double") >=
        lit(threshold / (1.0 + threshold)) *
          (col("__sa") + col("__sb")).cast("double") - lit(1e-9))
      .select("id_a", "id_b")
    verifyJaccardSets(pruned, sets, threshold)
  }
}
