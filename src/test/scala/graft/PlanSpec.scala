package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C, PipelineQueries => P}

/** Plan-property regression tests: the scale behavior lives in the
  * physical plan, so pin it — filters must reach the parquet scan,
  * scans must prune columns, dimension joins must broadcast, top-N must
  * not global-sort. A refactor that silently loses one of these
  * properties passes value checks but regresses at scale. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("q01: both filters push into the parquet scan; scan prunes columns") {
    val plan = formattedPlan(C.projectFilter(spark, dir))
    assert(plan.contains("LessThan(l_shipdate"), "shipdate filter not pushed")
    assert(plan.contains("GreaterThan(l_quantity,45.0)"), "quantity filter not pushed")
    // lineitem has 11 columns; the query needs 7
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length == 7,
      s"scan should read 7 pruned columns, got: $readSchema")
  }

  test("q03: both dimension joins broadcast (no fact-table shuffle)") {
    val plan = C.joinAgg(spark, dir).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q10: semi join broadcasts the orders side") {
    val plan = C.semiJoin(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "left-semi should build a broadcast hash relation on the orders side")
  }

  test("q13: top-N plans TakeOrderedAndProject, not a global sort") {
    val plan = formattedPlan(C.topN(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q09: exclude is a broadcast anti-join") {
    val plan = formattedPlan(C.antiJoin(spark, dir))
    assert(plan.contains("LeftAnti"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"))
  }

  test("q51: banded near-dup candidates come from a bucket hash join, never a cartesian") {
    val plan = P.cosineNearDupLsh(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the scale path must stay a (band,bucket)-keyed join")
  }

  test("q54: both session windows share a single sort") {
    // inspect the pipeline itself — the gate wraps it in the shared
    // localCheckpoint, whose plan is just the checkpoint scan
    val plan = C.sessionizePipeline(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Window ".r.findAllIn(plan).size == 2)
    // one sort feeds both windows
    assert("Sort \\[".r.findAllIn(plan).size <= 1,
      s"lag + running-sum must not plan separate sorts:\n$plan")
  }

  test("q57: BM25 top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = formattedPlan(P.bm25(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q61: decontamination broadcasts the benchmark shingle set") {
    val plan = P.decontaminate(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the eval-set side must broadcast — the corpus side must not shuffle its text")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q62: vocabulary head plans TakeOrderedAndProject over the term counts") {
    val plan = formattedPlan(P.vocabTop(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q63: as-of join plans as union+window — no join operator, one key shuffle") {
    val plan = C.asofClickView(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"as-of must be the window formulation, not a range/banded join:\n$plan")
    assert(plan.contains("Window"))
  }

  test("q66: range join is a bucket HASH join, never a nested loop") {
    val plan = C.rangeClickView(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"banded range join must plan as an equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"))
  }

  test("q59: hash split is shuffle-free (pure per-row projection)") {
    val plan = P.hashSplit(spark, dir).queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation sort
    assert(!plan.contains("hashpartitioning"),
      s"split assignment must not shuffle:\n$plan")
  }

  test("q81: weighted sample is shuffle-free (md5 coin rides the scan)") {
    val plan = P.weightedSampleDocs(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"weighted sampling must not shuffle:\n$plan")
  }

  test("q82: semantic decon is map-only — bench literal, no join, no shuffle") {
    val plan = P.semanticDecon(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"bench set must ship as a literal, not a join side:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"the corpus must not shuffle for decon:\n$plan")
  }

  test("q99: chunk plan is map-only — explode rides the scan, no join, no shuffle") {
    val plan = graft.operators.CorpusOps.chunkPlan(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("hashpartitioning"),
      s"chunking must be a per-row projection + explode:\n$plan")
    assert(plan.contains("Generate"),
      s"expected a sequence-explode Generate:\n$plan")
  }

  test("q78: resample is grid-explode + ONE window — no join operator") {
    val plan = C.resampleEvents(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"forward fill must be the as-of window formulation:\n$plan")
    assert(plan.contains("Generate") && plan.contains("Window"),
      s"expected sequence-explode + window:\n$plan")
  }

  test("q79: native unpivot is a single-scan Expand, not a union of scans") {
    val plan = formattedPlan(C.unpivotParts(spark, dir))
    assert(plan.contains("Expand"), s"unpivot should plan an Expand:\n$plan")
    // each physical node appears once in the tree and once in the
    // details listing — one scan node = exactly one "(n) Scan parquet"
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).size == 1,
      s"unpivot must scan the table once:\n$plan")
  }

  test("q107: PII redaction is map-only — regexp chain rides the scan, no join, no shuffle") {
    val plan = P.piiRedact(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("hashpartitioning"),
      s"redaction must be a per-row projection:\n$plan")
  }

  test("q108: OOV rate broadcasts the constant-size vocabulary head") {
    val plan = P.oovRate(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the 31-row vocab side must broadcast:\n$plan")
  }

  test("q104: persisted-stage incremental near-dup never reads the reference text") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    // Persist the reference stages, then build the FromStages plan with
    // the read-back parquet DataFrames UNCHECKPOINTED — every scan in
    // the plan is visible, so the assertion is on the real file set:
    // the reference documents table (and its text column) must appear
    // nowhere; the only parquet scans are the two stage tables.
    val ref = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
    val inc = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 1).limit(50)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val base = java.nio.file.Files.createTempDirectory("graft_planspec_ref_")
    Dedup.shingleSets(ref, "doc_id", "text", 3)
      .write.parquet(base.resolve("sets").toString)
    Dedup.minHashSigsFromSets(
        spark.read.parquet(base.resolve("sets").toString), "doc_id", 64)
      .write.parquet(base.resolve("sigs").toString)
    val refSets = spark.read.parquet(base.resolve("sets").toString)
    val refSigs = spark.read.parquet(base.resolve("sigs").toString)
    val incSets = Dedup.shingleSets(inc, "doc_id", "text", 3)
    val incSigs = Dedup.minHashSigsFromSets(incSets, "doc_id", 64)
    val out = Dedup.nearDupAgainstReferenceFromStages(
      incSets, incSigs, refSets, refSigs, "doc_id")
    val plan = formattedPlan(out)
    assert(!plan.contains("documents.parquet"),
      s"reference side must consume ONLY the persisted stages:\n$plan")
    assert(plan.contains("sets") && plan.contains("sigs"),
      s"expected scans of the persisted stage parquet:\n$plan")
    // and the persisted path is result-identical to the recompute path
    val expect = Dedup.nearDupAgainstReference(inc, ref, "doc_id", "text")
    assert(out.orderBy("inc_id", "ref_id").collect().toSeq ==
      expect.orderBy("inc_id", "ref_id").collect().toSeq)
  }

  test("q137-139: persisted ANN fits round-trip bit-exactly and the corpus is never scanned for fitting") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = Similarity.normalizeCorpus(
      graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding")
    val centers = Similarity.fitQuantizer(
      emb, "vec_id", "embedding", nlist = 8, dim = 64, seed = 42L, iters = 2)
    val books = Similarity.fitCodebooks(
      emb, "vec_id", "embedding", m = 4, ksub = 8, dsub = 16,
      seed = 4242L, iters = 2)
    val base = java.nio.file.Files
      .createTempDirectory("graft_planspec_fit_").toString
    Similarity.writeFitStages(spark, base, Some(centers), Some(books))
    val (c2, b2) = Similarity.fitStagesFromParquet(spark, base)
    // bit-exact round-trip: roundCoord6 doubles through parquet
    assert(c2.get.map(_.toSeq).toSeq == centers.map(_.toSeq).toSeq,
      "coarse centers did not round-trip bit-exactly")
    assert(b2.get.map(_.map(_.toSeq).toSeq).toSeq ==
      books.map(_.map(_.toSeq).toSeq).toSeq,
      "codebooks did not round-trip bit-exactly")
    // With fitted tensors supplied, fitting is driver-side literal
    // injection: the query plan scans the embeddings parquet EXACTLY
    // once (the assignment/scoring pass over the pre-normalized
    // corpus) plus the broadcast query side — no fit passes. An
    // in-session fit would not show in the plan either, but it would
    // run corpus JOBS at fit time; supplying the read-back tensors and
    // seeing one corpus scan proves the persisted path needs none.
    val out = Similarity.ivfTopK(emb.localCheckpoint(), "vec_id",
      "embedding", emb.filter(col("vec_id") < 4).localCheckpoint(),
      k = 3, nlist = 8, nprobe = 2, preNormalized = true,
      fittedCenters = c2)
    val plan = formattedPlan(out)
    assert(!plan.contains("embeddings.parquet"),
      s"fit/assign must consume the checkpointed corpus + literal centers, not re-scan:\n$plan")
    // and result-identical to the in-session-fit path
    val expect = Similarity.ivfTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 4), k = 3, nlist = 8, nprobe = 2,
      preNormalized = true, fittedCenters = Some(centers))
    assert(out.orderBy("query_id", "rnk").collect().toSeq ==
      expect.orderBy("query_id", "rnk").collect().toSeq)
  }

  test("q153/q156: sketch heads plan TakeOrderedAndProject, never a global sort") {
    // each KMV sketch and the E-S sample is an orderBy+limit over a
    // corpus-sized table — the plan must take per-partition heads +
    // merge (TakeOrderedAndProject), not sort the table globally
    val p153 = P.kmvOverlap(spark, dir).queryExecution.executedPlan.toString
    assert("TakeOrderedAndProject".r.findAllIn(p153).size >= 3,
      s"three KMV sketches must each be a TakeOrdered:\n$p153")
    val p156 = P.weightedReservoir(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p156.contains("TakeOrderedAndProject"),
      s"E-S top-n must be a TakeOrdered:\n$p156")
  }

  test("q155: typed KMV aggregate runs partial (map-side) + final — the merge path is live") {
    val plan = C.kmvWindows(spark, dir).queryExecution.executedPlan.toString
    // typed Aggregator with an array buffer plans ObjectHashAggregate;
    // partial + final proves map-side sketch combine actually runs
    // (the mergeable-summaries property, not just a single-node fold)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
  }

  test("q173: typed HLL aggregate runs partial (map-side) + final — register merge is live") {
    val plan = C.hllWindows(spark, dir).queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
  }

  test("q193: bucketed layout joins with zero join-side exchanges") {
    val plan = C.bucketedJoin(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-aligned SMJ must not shuffle either side:\n${plan.take(3000)}")
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan must be bucket-aware:\n${plan.take(3000)}")
  }

  test("q183: the custom as-of strategy plans AsofJoinExec, one shuffle+sort per side") {
    val plan = C.asofClickViewNative(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(2500))
    assert(!plan.contains("Window"),
      s"native as-of must not fall back to the window composition:\n${plan.take(2500)}")
  }

  test("q181: runtime bloom filter probes the lineitem scan before the join shuffle") {
    val df = C.bloomJoin(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("bloom"),
      s"expected an injected bloom runtime filter:\n${plan.take(3000)}")
    // and it answers identically to the plain-conf join
    import org.apache.spark.sql.functions._
    val ord = graft.sources.Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F" && col("o_totalprice") > 400000)
    val li = graft.sources.Tables.lineitem(spark, dir)
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .agg(count(lit(1)), sum(col("l_quantity").cast("long")))
      .collect()(0)
    val got = df.collect()(0)
    assert(got.getLong(0) == plain.getLong(0) &&
      got.getLong(2) == plain.getLong(1))
  }

  test("q180: grouped top-k is a mergeable aggregate — no WindowExec, partial+final live") {
    val plan = C.groupedTopK(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"top-k per group must not plan a window sort:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
  }

  test("q174: shard-union estimate reads ONLY persisted registers — no corpus in the plan") {
    val df = P.hllShardUnion(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"register merge must never re-read corpus text:\n${plan.take(3000)}")
    assert(plan.contains("graft_hllreg_"),
      s"expected a persisted-register parquet scan:\n${plan.take(3000)}")
    // and the merged row really is the pointwise-max union: its
    // registers dominate every shard's
    val rows = df.collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rows.contains("__all__") && rows.size >= 2)
    // z_scaled decreases as registers grow: the union's indicator sum
    // must be <= every shard's (more/higher registers => smaller Z)
    rows.filter(_._1 != "__all__").foreach { case (src, z) =>
      assert(rows("__all__") <= z, s"union Z must dominate shard $src")
    }
  }

  test("q151: persisted-LM scoring joins parquet counts — exactly one Aggregate, no refit") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextCorpus
    val arrs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(lower(col("text"))).as("a"))
      .localCheckpoint()
    val base = java.nio.file.Files
      .createTempDirectory("graft_planspec_lm_").toString
    TextCorpus.writeLmStages(spark, base, arrs, "doc_id")
    val (uni, cab, v) = TextCorpus.lmStagesFromParquet(spark, base)
    val scored = TextCorpus.bigramLogProbFromModel(
      graft.sources.Tables.documents(spark, dir), arrs, "doc_id",
      addK = 0.5, uni, cab, v)
    // the q118 in-session path fits in-plan: unigram + bigram count
    // aggregates feed the scorer. The persisted path must hold EXACTLY
    // one Aggregate — the per-doc scorer — with both count tables
    // arriving as parquet scans; a second Aggregate means the plan is
    // re-fitting from the corpus.
    val aggs = scored.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1,
      s"persisted-LM scoring must not re-aggregate the corpus, found ${aggs.size} Aggregates")
    val plan = formattedPlan(scored)
    assert("lm_uni".r.findAllIn(plan).nonEmpty &&
      "lm_bigram".r.findAllIn(plan).nonEmpty,
      s"count tables must come from the persisted stage parquet:\n$plan")
    // and result-identical to the in-session-fit path on the fit corpus
    val expect = TextCorpus.bigramLogProbFromArrs(
      graft.sources.Tables.documents(spark, dir), arrs, "doc_id", addK = 0.5)
    assert(scored.orderBy("doc_id").collect().toSeq ==
      expect.orderBy("doc_id").collect().toSeq,
      "persisted-LM scores must be bit-identical to the in-session fit")
  }

  test("q146: staleness audit consumes literal centers — corpus scanned once, no fit pass") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = Similarity.normalizeCorpus(
      graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding")
    val centers = Similarity.fitQuantizer(
      emb, "vec_id", "embedding", nlist = 8, dim = 64, seed = 42L, iters = 2)
    val flagged = graft.sources.Tables.embeddings(spark, dir)
      .withColumn("is_new", col("vec_id") % 2 === 1)
    val out = Similarity.indexStalenessAudit(flagged, "vec_id", "embedding",
      "is_new", centers, tvdThreshold = 0.3)
    val plan = formattedPlan(out)
    // fitted centers ride as a literal and the corpus feeds exactly
    // one eager pass into the nlist-row per-cell checkpoint — so the
    // RESULT plan must be corpus-free: no parquet scan anywhere, only
    // nlist-row joins over the materialized aggregate (without the
    // checkpoint the four downstream consumers re-derived the
    // aggregate and the plan scanned the corpus 8×)
    assert(!plan.contains("embeddings.parquet"),
      s"post-aggregate plan must never rescan the corpus:\n$plan")
  }

  test("q142: approx profiler is ONE scan with NO Expand (the exact profiler's read amplification)") {
    import graft.operators.Quality
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    val approx = Quality.profileTableApprox(
      graft.sources.Tables.orders(spark, dir), cols)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx profile must not Expand the scan:\n$plan")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(formattedPlan(approx)).size == 1,
      "approx profile must scan the table exactly once")
    // the exact path DOES Expand — the contrast this twin exists for
    val exact = Quality.profileTable(
      graft.sources.Tables.orders(spark, dir), cols)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("q100: fingerprint-table incremental dedup matches the recompute path") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val d = graft.sources.Tables.documents(spark, dir)
    val inc = d.filter(col("doc_id") % 2 === 1)
    val ref = d.filter(col("doc_id") % 2 === 0)
    val fps = ref.select(
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val viaFps = Dedup.dedupAgainstReferenceFps(inc, "doc_id", "text", fps)
    val direct = Dedup.dedupAgainstReference(inc, ref, "doc_id", "text")
    assert(viaFps.orderBy("doc_id").collect().toSeq ==
      direct.orderBy("doc_id").collect().toSeq)
  }

  test("q120: JL projection is map-only — sign matrix is a literal, no join, no shuffle") {
    val plan = graft.operators.Similarity.randomProject(
        graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding",
        outDim = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the sign matrix must ship as a literal, not a join side:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"projection must ride the scan:\n$plan")
  }

  test("q123: z-value is a pure bitwise projection — no shuffle before the bucket agg") {
    import org.apache.spark.sql.functions._
    val plan = graft.sources.Tables.lineitem(spark, dir)
      .select(graft.operators.Layout.zValue(
        col("l_partkey"), col("l_suppkey")).as("zv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("Join"),
      s"z-key must be computable in-scan:\n$plan")
  }

  test("q08: pivot with explicit values skips the value-discovery job") {
    import org.apache.spark.sql.functions._
    // same base for both variants so reads/listing cost is identical
    val base = graft.sources.Tables.events(spark, dir).cache()
    base.count()
    // highest job id, not the retained-list LENGTH: the UI store evicts
    // old jobs past spark.ui.retainedJobs, so a length-based counter
    // can DECREASE over a long suite (r15: 998 → 902 mid-test) — the
    // max id is monotonic regardless of eviction
    def lastJob = spark.sparkContext.statusTracker
      .getJobIdsForGroup(null).foldLeft(-1)(math.max)
    val j0 = lastJob
    base.groupBy("user_id").pivot("event_type", C.eventTypes).count()
      .queryExecution.executedPlan
    val j1 = lastJob
    assert(j1 == j0, "explicit-values pivot launched a job during planning")
    base.groupBy("user_id").pivot("event_type").count()
      .queryExecution.executedPlan
    val j2 = lastJob
    assert(j2 > j1, "discovery pivot should have run a distinct job " +
      "(sanity check that the counter measures what we think)")
    base.unpersist()
  }

  test("q397: customer arrives via a partitioned JDBC scan with the acctbal filter pushed") {
    val df = C.jdbcJoinAgg(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"),
      "no JDBC scan in the plan — the gate must read through JdbcSource")
    assert(plan.contains("numPartitions="),
      "JDBC customer scan is not partitioned (auto-probed range scan lost)")
    assert(plan.toUpperCase.contains("GREATERTHAN(C_ACCTBAL"),
      "acctbal predicate not pushed into the JDBC scan")
    // the round trip itself is value-gated by q397's DuckDB oracle;
    // here just prove rows flow
    assert(df.count() > 0)
  }

  test("q451: LZ76 complexity is map-only — the native expression rides the scan") {
    val plan = P.lzComplexity(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("hashpartitioning"),
      s"LZ76 must be a per-row projection:\n$plan")
    assert(plan.contains("graft_lz76"),
      s"expected the native expression on the scan:\n$plan")
  }

  test("q448: per-lang bucketing broadcasts the cut points — no per-lang sort/ntile") {
    val plan = P.perplexityFilter(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"cut points must broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"bucketing must compare against broadcast bounds, not rank:\n$plan")
  }

  test("q453: AdaBoost scoring is map-only — stumps are literals on the scan") {
    val (wide, stumps) = {
      // score path only (training is a separate driver loop)
      val w = graft.sources.Tables.documents(spark, dir)
        .selectExpr("doc_id", "1 as y", "cast(n_chars as double) as f1",
          "cast(n_chars as double) as f2", "cast(n_chars as double) as f3")
      (w, Seq(graft.operators.Boosting.Stump(1, 1, 10.0, 1, 0.4, 0.2)))
    }
    val plan = graft.operators.Boosting.scores(wide, stumps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("hashpartitioning"),
      s"scoring must be a per-row projection:\n$plan")
  }

  test("q459: rec_type and shard_file pushdown reach the WARC scan description") {
    // the AQE-wrapped executed plan hides BatchScanExec from collect();
    // the string form descends it
    val plan = P.dsv2WarcManifest(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-warc"), s"no warc scan in plan:\n$plan")
    assert(plan.contains("rec_type") && plan.contains("response"),
      s"rec_type filter not pushed:\n$plan")
    // manifest projection must NOT read text (md5 is projected)
    assert(plan.contains("payload_md5"), s"projection lost md5:\n$plan")
    assert(!plan.contains("pruned=[shard_file,idx,rec_type,uri,off,content_length,payload_md5,text]"),
      s"projection not pruned (full schema read):\n$plan")
  }

  test("q162: covariance stage is one object aggregate — no Generate, no d² explode") {
    // the r13-verdict covariance constant: the dim² product sums must
    // come from the native outer-product buffer, not a per-row d²
    // struct flatten exploded into d² rows + a d²-key hash aggregate
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val plan = graft.operators.Spectral.covarianceAgg(emb, "embedding", 10000L, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"covariance stage must not explode:\n$plan")
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"),
      s"expected the typed-imperative aggregate path:\n$plan")
    assert(plan.contains("graft_vec_outer_sum") &&
      plan.contains("graft_vec_sum"),
      s"native vector kernels missing from the plan:\n$plan")
  }
}
