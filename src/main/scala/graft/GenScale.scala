package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-decade test-data generator: replicates a source scale-factor
  * directory `copies`× with key shifting, producing a corpus one
  * decade larger for slope-gating (default: sf0.1 → a synthetic sf1
  * under /tmp/sf1). The one-decade gate (sf0.01→sf0.1) cannot separate
  * O(n) from O(n log n) or see a constant that becomes a cliff; this
  * gives the slope table its second decade without touching the
  * read-only driver-generated testdata.
  *
  * Construction (documented in SCALING.md):
  *  - fact tables replicate with per-copy key strides (multiples of 10
  *    so `% 10`-sampled subsets keep their fraction); FOREIGN keys
  *    shift by the SAME stride as their parent, so join fan-outs,
  *    selectivities and basket sizes are copy-invariant — the corpus
  *    is 10 disjoint sf0.1-shaped islands, which is exactly what a
  *    10× corpus of independent data looks like.
  *  - region/nation stay fixed (TPC-H dimension semantics).
  *  - documents text is token-suffixed per copy (`w` → `w_k`), making
  *    copies' shingle sets disjoint: without this every doc would have
  *    9 exact/near duplicates and dedup pair volume would grow
  *    quadratically in copies — a fake superlinearity the gate would
  *    misread. Vocabulary grows copies×, the within-copy token
  *    structure is untouched. n_chars is recomputed.
  *  - embeddings rotate by k positions per copy: norms and within-copy
  *    pairwise similarities are EXACTLY preserved (rotation is
  *    orthogonal), cross-copy similarities decorrelate, so planted
  *    near-dup structure stays per-copy-constant instead of
  *    copies²-exploding in LSH buckets / Lloyd cells.
  *  - events shift ids but keep timestamps: 10× users over the same
  *    time span (denser traffic, same horizon) — windows/sessions per
  *    user stay the same shape.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    // THIRD-decade support (r17): replicating an already-replicated dir
    // (sf1 → sf10) needs (a) strides 10× wider so copy key ranges clear
    // the source's full (already-shifted) range — SPARK_GRAFT_SCALE_
    // STRIDE_MULT, default 1 keeps sf0.1→sf1 byte-identical to r16 —
    // and (b) a different embedding decorrelation: rotation composes
    // (rot_i∘rot_k = rot_{i+k}), so re-rotating sf1's islands would
    // make island/copy pairs with equal total rotation IDENTICAL
    // vector sets under different ids — a planted near-dup explosion
    // that fakes quadratic ANN/dedup volume. EMB_MODE=signflip instead
    // multiplies each component by an md5-derived ±1 per (copy, dim) —
    // also orthogonal (a diagonal ±1 matrix), so norms and within-copy
    // similarities are EXACTLY preserved while cross-copy similarities
    // decorrelate, and flip patterns never collide across copies.
    val strideMult = sys.env.getOrElse("SPARK_GRAFT_SCALE_STRIDE_MULT", "1").toLong
    val embMode = sys.env.getOrElse("SPARK_GRAFT_SCALE_EMB_MODE", "rotate")
    // Token-suffix tag for re-replication: sf1 islands carry `w_j`
    // suffixes, so sf10's copy-k suffix must NOT be the bare `_k` —
    // copy k of the unsuffixed base island would otherwise reproduce
    // island k's text verbatim under new doc_ids (planted EXACT
    // duplicates — a fake quadratic dedup load). Set e.g. TOKEN_TAG=x
    // so copy suffixes are `_xk`, disjoint from every `_j`.
    val tokenTag = sys.env.getOrElse("SPARK_GRAFT_SCALE_TOKEN_TAG", "")
    // Customer-NAME decorrelation (r17): replication copies c_name
    // verbatim, so every base customer exactly matches its copies-1
    // replicas under any entity-resolution rule (lev=0, Δbal=0, same
    // nation/segment) — measured: 0 matched identity pairs at sf0.1,
    // 675k at sf1, 74.25M at sf10, i.e. a ×(copies²) matched-pair
    // relation that is a CONSTRUCTION artifact violating the disjoint-
    // islands design (the same fake-quadratic class the token suffix
    // and embedding rotation exist to prevent), not operator behavior.
    // When NAME_TAG is set, copy k > 0 suffixes c_name with
    // `_<tag><k><tag><k>`: two different copies (or two different
    // replication stages with different tags) differ in ≥ 2 positions,
    // so lev > 1 and cross-copy rows can never match; suffixed vs
    // unsuffixed differ in length by ≥ 4. Default "" keeps the legacy
    // (r16) construction byte-identical.
    val nameTag = sys.env.getOrElse("SPARK_GRAFT_SCALE_NAME_TAG", "")
    val spark = GraftSession.local("graft-genscale")
    import graft.sources.Tables

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[genscale] $name done")
    }

    def shifted(df: DataFrame, k: Int, strides: (String, Long)*): DataFrame =
      strides.foldLeft(df) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + lit(s * k)) }

    def replicate(df: DataFrame, per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(k => per(df, k)).reduce(_ unionByName _)

    // strides: clean multiples of 10 above each key's sf0.1 ceiling
    // (× strideMult when replicating an already-replicated source)
    val ORD = 10000000L * strideMult; val CUST = 1000000L * strideMult
    val PART = 1000000L * strideMult
    val SUPP = 100000L * strideMult; val EVT = 10000000L * strideMult
    val USR = 1000000L * strideMult
    val DOC = 1000000L * strideMult; val VEC = 1000000L * strideMult

    // dimensions: fixed, copied once
    write("region", Tables.region(spark, src), 1)
    write("nation", Tables.nation(spark, src), 1)

    write("customer", replicate(Tables.customer(spark, src), (d, k) => {
      val s = shifted(d, k, "c_custkey" -> CUST)
      if (k == 0 || nameTag.isEmpty) s
      else s.withColumn("c_name",
        concat(col("c_name"), lit(s"_$nameTag$k$nameTag$k")))
    }), 4)
    write("supplier", replicate(Tables.supplier(spark, src),
      (d, k) => shifted(d, k, "s_suppkey" -> SUPP)), 2)
    write("part", replicate(Tables.part(spark, src),
      (d, k) => shifted(d, k, "p_partkey" -> PART)), 4)
    write("orders", replicate(Tables.orders(spark, src),
      (d, k) => shifted(d, k, "o_orderkey" -> ORD, "o_custkey" -> CUST)), 8)
    write("lineitem", replicate(Tables.lineitem(spark, src),
      (d, k) => shifted(d, k, "l_orderkey" -> ORD, "l_partkey" -> PART,
        "l_suppkey" -> SUPP)), 16)
    write("events", replicate(Tables.events(spark, src),
      (d, k) => shifted(d, k, "event_id" -> EVT, "user_id" -> USR)), 8)

    write("documents", replicate(Tables.documents(spark, src), (d, k) => {
      val s = shifted(d, k, "doc_id" -> DOC)
      val t =
        if (k == 0) s
        else s.withColumn("text", array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"_$tokenTag$k"))),
          " "))
      t.withColumn("n_chars", length(col("text")).cast("long"))
    }), 8)

    write("embeddings", replicate(Tables.embeddings(spark, src), (d, k) => {
      val s = shifted(d, k, "vec_id" -> VEC)
      if (k == 0) s
      else if (embMode == "signflip")
        // ±1 per (copy, position): sign = +1 iff the low hex digit of
        // md5("flip:k:i") is even — deterministic, reproducible
        s.withColumn("embedding", zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => when(
            conv(substring(md5(concat(lit(s"flip:$k:"), i.cast("string"))),
              32, 1), 16, 10).cast("int") % 2 === 0, x).otherwise(-x)))
      else s.withColumn("embedding", concat(
        slice(col("embedding"), lit(k + 1), size(col("embedding")) - k),
        slice(col("embedding"), lit(1), lit(k))))
    }), 2)

    // loud self-check: every table must land at copies× (dims at 1×)
    val facts = Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings")
    facts.foreach { t =>
      val lo = Tables.load(spark, src, t).count()
      val hi = Tables.load(spark, out, t).count()
      require(hi == lo * copies, s"$t: expected ${lo * copies}, got $hi")
    }
    println(s"""{"src":"$src","out":"$out","copies":$copies,"ok":true}""")
    spark.stop()
  }
}
