package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality operators — the validation layer a pipeline runs
  * BEFORE trusting a snapshot: key-uniqueness and referential-integrity
  * checks as plain distributed queries (violations come back as rows,
  * not booleans, so the caller can quarantine them), and zero-extra-pass
  * metric observation riding an existing action.
  */
object Quality {

  /** Rows whose `keys` occur more than once: (keys..., n_rows). Empty
    * result = the uniqueness constraint holds. One keyed aggregate —
    * the violating key set is usually tiny, the scan is the cost. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty && keys.forall(df.columns.contains),
      s"keys $keys must exist in ${df.columns.toSeq}")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)
  }

  /** Referential-integrity violations: child rows whose `childKeys`
    * have no match in `parent`'s `parentKeys` (null child keys are NOT
    * violations — SQL FK semantics). Returns the orphan child rows.
    * A broadcast-able parent side makes this a map-side anti-join; a
    * big parent is a plain shuffled anti-join — either way no
    * pair-wise work. */
  def fkViolations(child: DataFrame, parent: DataFrame,
      childKeys: Seq[String], parentKeys: Seq[String]): DataFrame = {
    require(childKeys.nonEmpty && childKeys.length == parentKeys.length,
      "childKeys and parentKeys must be non-empty and same length")
    require(childKeys.forall(child.columns.contains) &&
      parentKeys.forall(parent.columns.contains),
      s"keys must exist: $childKeys in ${child.columns.toSeq}, " +
        s"$parentKeys in ${parent.columns.toSeq}")
    val p = parent.select(parentKeys.zip(childKeys)
      .map { case (pc, cc) => col(pc).as(s"__p_$cc") }: _*).distinct()
    val cond = childKeys.map(c => col(c) === col(s"__p_$c")).reduce(_ && _)
    child
      .filter(childKeys.map(col(_).isNotNull).reduce(_ && _))
      .join(p, cond, "left_anti")
  }

  /** Attach an [[Observation]] computing row count plus per-column
    * null counts to `df` — metrics ride whatever action the caller
    * runs next (NO extra scan, unlike a separate validation query).
    * Read them after the action: `obs.get("n_rows")` etc. */
  def observed(df: DataFrame, nullCols: Seq[String],
      name: String = "graft_quality"): (DataFrame, Observation) = {
    require(nullCols.forall(df.columns.contains),
      s"columns $nullCols must exist")
    val obs = Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"n_null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** One-pass table profile — the DESCRIBE-style column summary every
    * data platform ships: per column, non-null/null counts, exact
    * distinct count, and min/max (numeric columns as doubles; other
    * types lexicographically as strings — ISO dates sort
    * chronologically). ONE scan for all columns: a single wide
    * aggregate (Spark plans the multi-column exact distincts via one
    * Expand) exploded into per-column rows. At corpus scale swap the
    * exact distincts for approx_count_distinct — the q52 trade,
    * documented there. */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns $cols must exist in ${df.columns.toSeq}")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      val base = Seq(count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"))
      val mm = df.schema(c).dataType match {
        case _: NumericType => Seq(
          min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c"),
          lit(null).cast("string").as(s"__mns_$c"),
          lit(null).cast("string").as(s"__mxs_$c"))
        case _ => Seq(
          lit(null).cast("double").as(s"__mn_$c"),
          lit(null).cast("double").as(s"__mx_$c"),
          min(col(c).cast("string")).as(s"__mns_$c"),
          max(col(c).cast("string")).as(s"__mxs_$c"))
      }
      base ++ mm
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_null"),
        col(s"__ndv_$c").as("ndv"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__mns_$c").as("min_str"), col(s"__mxs_$c").as("max_str"))): _*))
        .as("r"))
      .select("r.*")
  }

  /** [[profileTable]]'s CORPUS-SCALE twin: identical per-column facts
    * except the distinct count comes from `approx_count_distinct`
    * (HyperLogLog++, Heule et al. EDBT'13; `rsd` relative standard
    * deviation) — ONE scan and NO Expand. The exact profiler's
    * multi-column `countDistinct` makes Catalyst multiply the scan by
    * the column count through an Expand (fine at gate scale, a
    * column-count× read amplification at 100 TB); the HLL++ sketches
    * for every column ride the same single aggregate pass, registers
    * merge commutatively (order-free, deterministic for a fixed
    * input), and only sketch-sized state reaches the driver. The gate
    * (q142) emits the exact facts plus a q52-style boolean proving
    * each column's estimate sits inside the sketch's ±3·rsd band —
    * the path a user actually runs at 100 TB, oracle-proven. */
  def profileTableApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns $cols must exist in ${df.columns.toSeq}")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      val base = Seq(count(col(c)).as(s"__n_$c"),
        approx_count_distinct(col(c), rsd).as(s"__ndv_$c"))
      val mm = df.schema(c).dataType match {
        case _: NumericType => Seq(
          min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c"),
          lit(null).cast("string").as(s"__mns_$c"),
          lit(null).cast("string").as(s"__mxs_$c"))
        case _ => Seq(
          lit(null).cast("double").as(s"__mn_$c"),
          lit(null).cast("double").as(s"__mx_$c"),
          min(col(c).cast("string")).as(s"__mns_$c"),
          max(col(c).cast("string")).as(s"__mxs_$c"))
      }
      base ++ mm
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_null"),
        col(s"__ndv_$c").as("ndv_approx"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__mns_$c").as("min_str"), col(s"__mxs_$c").as("max_str"))): _*))
        .as("r"))
      .select("r.*")
  }

  /** Benford's-law leading-digit audit of a positive 2-decimal money
    * column (Benford 1938; Nigrini's fraud-screening standard): one
    * row per digit 1-9 with the observed count/frequency and the
    * Benford expectation log10(1+1/d). Naturally-grown magnitudes
    * track the curve; fabricated or truncated data doesn't. The
    * leading digit comes from the INTEGER cents string — scaling by
    * 100 never changes the leading digit, and integer-to-string is
    * engine-identical where double formatting is not. One map-side
    * combined 9-group aggregate. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    import graft.functions.MysqlFunctions.oracleRound
    val cents = round(col(valueCol) * 100).cast("long")
    val d = substring(cents.cast("string"), 1, 1).cast("int")
    val n = df.filter(col(valueCol) > 0)
      .select(d.as("digit")).groupBy("digit")
      .agg(count(lit(1)).as("n"))
    val tot = n.agg(sum("n").cast("double").as("__t"))
    n.crossJoin(broadcast(tot))
      .withColumn("obs_freq", oracleRound(col("n") / col("__t"), 4))
      .withColumn("benford_freq", oracleRound(
        log10(lit(1.0) + lit(1.0) / col("digit")), 4))
      .select("digit", "n", "obs_freq", "benford_freq")
  }

  /** Functional-dependency audit: does `det → dep` hold? One row per
    * candidate FD with the group count, the number of determinant
    * groups carrying more than one distinct dependent value, and the
    * verdict — the schema-profiling primitive behind key discovery
    * and denormalization checks. One keyed aggregate per FD. */
  def fdAudit(df: DataFrame, fdName: String, det: String,
      dep: String): DataFrame = {
    df.groupBy(col(det))
      .agg(countDistinct(col(dep)).as("__nd"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("__nd") > 1, 1)).as("n_violating"))
      .select(lit(fdName).as("fd"), col("n_groups"), col("n_violating"),
        (col("n_violating") === 0).as("holds"))
  }

  /** Join-key skew audit — the pre-shuffle decision check a 100 TB
    * pipeline runs BEFORE keying a join or aggregation: per-key count
    * distribution facts (key cardinality, min/max multiplicity, the
    * number of hot keys at ≥ 1.2× the mean, and the Gini coefficient
    * of the count distribution). Gini ≈ 0 → uniform keys, hash
    * partitioning is safe; Gini → 1 → a salted join or AQE skew
    * handling is mandatory.
    *
    * Scale shape: the only corpus-sized step is the per-key count.
    * Everything after runs on the count-of-counts histogram (one row
    * per distinct multiplicity — O(√N) rows at worst), ranked with the
    * two-level [[CoreQueries.bucketedCumCounts]] rather than a global
    * window. Gini comes integer-exact from the histogram: the block of
    * `m` keys at multiplicity `v` occupies ranks `(cum−m, cum]`, so
    * Σ rank·count over the block is `v·(m·(cum−m) + m(m+1)/2)`; with
    * ranks ascending by count, `G = (2·Σ i·cᵢ − (n+1)·Σcᵢ)/(n·Σcᵢ)`.
    * Products are computed in decimal(38,0) — rows × keys exceeds a
    * signed long well before 100 TB. The hot-key test is the integer
    * inequality `5·v·n ≥ 6·total` (count ≥ 1.2× mean, no division). */
  def keySkewAudit(df: DataFrame, keyCol: String, name: String): DataFrame = {
    import graft.functions.MysqlFunctions.oracleRound
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cnts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("v"))
    val hist = cnts.groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("__g", lit(0))
    val blocks = CoreQueries.bucketedCumCounts(hist, Seq("__g"))
      .withColumn("__sr",
        expr("cnt * (cum - cnt) + (cnt * (cnt + 1)) div 2"))
    val tots = blocks.agg(
      sum("cnt").as("n"),
      sum(dec(col("v")) * dec(col("cnt"))).as("tot"),
      sum(dec(col("v")) * dec(col("__sr"))).as("s"),
      min("v").as("min_cnt"), max("v").as("max_cnt"))
    val hot = hist.crossJoin(broadcast(tots.select(col("n"), col("tot"))))
      .filter(dec(lit(5)) * dec(col("v")) * dec(col("n")) >=
        dec(lit(6)) * col("tot"))
      .agg(coalesce(sum("cnt"), lit(0L)).as("hot_keys"))
    tots.crossJoin(broadcast(hot))
      .select(lit(name).as("key_name"), col("n").as("n_keys"),
        col("tot").cast("long").as("total_rows"),
        col("min_cnt"), col("max_cnt"), col("hot_keys"),
        oracleRound((dec(lit(2)) * col("s") -
            (dec(col("n")) + dec(lit(1))) * col("tot")).cast("double") /
          (col("n").cast("double") * col("tot").cast("double")), 6)
          .as("gini"))
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns
    * (Sweeney 2002 / Machanavajjhala et al. 2007 — the release-gate
    * check a dataset passes before leaving its enclave): one row per
    * quasi-identifier group with its population `n`, the number of
    * distinct sensitive values `l`, and the two violation flags
    * (`n < k` — the group is re-identifiable; `l < minL` — the group
    * leaks its sensitive value even when anonymous). Violations come
    * back as rows, not booleans, the [[duplicateKeys]] contract.
    * One keyed aggregate; group count is bounded by the
    * quasi-identifier domain product, not the table. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, minL: Long): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.forall(df.columns.contains),
      s"quasi columns $quasiCols must exist in ${df.columns.toSeq}")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l"))
      .withColumn("k_violation", col("n") < k)
      .withColumn("l_violation", col("l") < minL)
  }

  /** ε-differentially-private count release (Dwork TCC'06 Laplace
    * mechanism) with DETERMINISTIC noise: the Laplace draw comes from
    * inverting the CDF at an md5-derived uniform,
    * `noise = -(Δ/ε)·sign(u−½)·ln(1−2|u−½|)` with
    * `u = (md5_64("dp:ε:group")+½)/2³²` — so the released table is a
    * pure function of (group, ε) and the release itself is
    * oracle-checkable, the property every other stochastic operator
    * in this engine pins the same way (q81/q156's md5-uniform
    * convention). A production deployment would swap the salt for a
    * secret per-release nonce; NOTHING else changes — the mechanism,
    * sensitivity accounting and post-processing are the real thing.
    * Unit sensitivity (Δ=1): disjoint groups, each row in exactly one
    * count. Released value is post-processed (round to integer, clamp
    * at 0) which DP composes with for free. One row per (group, ε)
    * across the ε ladder, so the utility-vs-budget tradeoff is
    * visible in the gate: `n_true` is carried ONLY for the utility
    * audit (`abs_err`) — a real release drops it.
    *
    * Scale shape: one map-side-combined groupBy(group) count — the
    * only shuffle — then a broadcast-size cross join with the ε
    * ladder and per-row closed-form noise; no window, no driver
    * state. At 100 TB the released histogram is |groups| rows.
    */
  def dpCountRelease(df: DataFrame, groupCol: String,
      epsilons: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_true"))
    val ladder = epsilons.toDF("eps")
    val u = (graft.functions.TextFunctions.md5Int(
        concat(lit("dp:"), col("eps").cast("string"), lit(":"),
          col(groupCol).cast("string")), 8).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val centered = u - lit(0.5)
    val noise = graft.functions.MysqlFunctions.oracleRound(
      (lit(-1.0) / col("eps")) * signum(centered) *
        log(lit(1.0) - lit(2.0) * abs(centered)), 10)
    counts.crossJoin(broadcast(ladder))
      .withColumn("noise", noise)
      .withColumn("n_noisy", graft.functions.MysqlFunctions.oracleRound(
        col("n_true") + col("noise"), 10))
      .withColumn("n_released",
        greatest(lit(0L), floor(col("n_noisy") + lit(0.5)).cast("long")))
      .withColumn("abs_err", graft.functions.MysqlFunctions.oracleRound(
        abs(col("noise")), 10))
      .select(col(groupCol), col("eps"), col("n_true"), col("noise"),
        col("n_noisy"), col("n_released"), col("abs_err"))
  }

  /** Poisson-bootstrap confidence interval for a corpus mean — the
    * ONE-PASS bootstrap (Chamandy et al., Google 2012 "Estimating
    * uncertainty for massive data streams"): instead of drawing B
    * resamples of N rows (B corpus shuffles), every row carries a
    * Poisson(1) WEIGHT per replicate, so all B replicate sums
    * accumulate in a single scan with map-side combine — the only
    * shuffle is B combiner rows per partition. Weights come from the
    * md5-derived micro-uniform through the Poisson(1) inverse CDF as
    * INTEGER threshold comparisons (the CDF constants quantized to
    * 10⁻⁶, so weight assignment is exact on both engines); replicate
    * means are ratios of exact integer sums; the CI bounds are exact
    * order statistics of the B means (rank ⌈α·B⌉ and B+1−⌈α·B⌉ on
    * the ROUNDED means — no interpolation, engine-portable).
    */
  def poissonBootstrapCI(df: DataFrame, idCol: String,
      value: org.apache.spark.sql.Column, reps: Int): DataFrame = {
    import graft.functions.{MysqlFunctions => M, TextFunctions => T}
    // Poisson(1) CDF at k = 0..6, quantized to micro-units
    val thresholds = Seq(367879L, 735759L, 919699L, 981012L,
      996340L, 999406L, 999917L)
    val base = df.select(col(idCol).as("__id"), value.cast("long").as("__x"))
    val rep = base.select(col("__id"), col("__x"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("__u", pmod(T.md5Int(concat(lit("boot:"), col("b"),
        lit(":"), col("__id").cast("string")), 8), lit(1000000L)))
      .withColumn("__w", thresholds.map(t =>
        when(col("__u") >= t, 1L).otherwise(0L)).reduce(_ + _))
    val means = rep.groupBy("b").agg(
        sum(col("__w") * col("__x")).as("__sx"), sum("__w").as("__sw"))
      .where(col("__sw") > 0)
      .select(col("b"), M.oracleRound(
        col("__sx").cast("double") / col("__sw").cast("double"), 6)
        .as("m"))
      .coalesce(1)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      .orderBy(col("m").asc, col("b").asc)
    val loRank = math.ceil(0.025 * reps).toLong
    val hiRank = reps + 1 - loRank
    val ranked = means.withColumn("r", row_number().over(w))
    val overall = base.agg(count(lit(1)).as("n_docs"),
      M.oracleRound(sum("__x").cast("double")
        / count(lit(1)).cast("double"), 6).as("mean_all"))
    overall.crossJoin(broadcast(
        ranked.where(col("r") === loRank).select(col("m").as("ci_lo"))))
      .crossJoin(broadcast(
        ranked.where(col("r") === hiRank).select(col("m").as("ci_hi"))))
      .select(col("n_docs"), lit(reps).cast("int").as("n_reps"),
        col("mean_all"), col("ci_lo"), col("ci_hi"))
  }
}
