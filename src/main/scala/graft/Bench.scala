package graft

import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE machine-readable JSON line, also
  * written to bench_out.json so log noise can't hide it.
  *
  * A warm-up pass at the smallest sf dir runs first so the timed pass
  * measures steady-state query time, not session bring-up + codegen +
  * JIT of the first query (r1 charged ~25s of warm-up to whichever
  * query ran first). Failures are recorded per query in "errors" — a
  * crashed query must never appear as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // dev loop: SPARK_GRAFT_ONLY=q56_tfidf_top,q85_substring_dups times
    // the named queries in isolation (drift attribution — the driver
    // always runs the full map)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val queries = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val spark = GraftSession.local("graft-bench")

    if (Files.isDirectory(Paths.get(warmDir)) && warmDir != sfDir) {
      // progress line BEFORE each query: a hung/timed-out run's
      // truncated tail then names the in-flight query (r8's rc=124
      // cost a judge session to attribute; this line is the fix)
      queries.foreach { case (name, fn) =>
        System.err.println(s"[bench] warm $name")
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
      // drop the warm-up pass's shared-stage checkpoints so they don't
      // pin executor storage through the timed pass (r5/r6 saw ~1 s
      // cross-query attribution noise from lingering blocks + GC)
      graft.operators.PipelineQueries.clearSharedStages()
      graft.operators.CoreQueries.clearSharedStages()
      System.gc()
    }

    // Per-query shuffle/spill attribution (APPROXIMATE: listener events
    // are async; a 100 ms post-query drain catches them in practice).
    // Written to bench_metrics.json only — the driver's stdout contract
    // is untouched, and timings are taken BEFORE the drain sleep.
    val shuffleAgg = new java.util.concurrent.atomic.AtomicLongArray(3)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            shuffleAgg.addAndGet(0, m.shuffleReadMetrics.totalBytesRead)
            shuffleAgg.addAndGet(1, m.shuffleWriteMetrics.bytesWritten)
            shuffleAgg.addAndGet(2, m.diskBytesSpilled)
          }
        }
      })
    def snapMetrics(): (Long, Long, Long) =
      (shuffleAgg.get(0), shuffleAgg.get(1), shuffleAgg.get(2))

    // Machine-load calibration: median-of-3 of a FIXED-COST trivial
    // query (q12 — one distinct over 15k rows, byte-identical across
    // rounds) timed before the pass. Any consumer comparing bench
    // totals across runs/boxes can normalize by this — r6's driver run
    // read as a fake 2x regression purely because the machine was
    // loaded (the same trivial queries inflated 7-15x); with the
    // calibration field that state is detectable from the artifact
    // alone (builder-box median is ~0.2 s; a calibration of 1 s+ means
    // the run is contention-dominated and per-query times are noise).
    // Guarded: a calibration failure must not abort the bench before
    // the per-query loop records anything (its own try/catch contract).
    // Known side effect: q12's own timed entry gets three extra warm
    // runs and reads slightly fast — compare q12 across rounds via the
    // calibration field itself, not its timed entry.
    val calibration = SparkEntry.queries.get("q12_distinct").flatMap { fn =>
      try {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        Some((runs.sorted.apply(1), runs))
      } catch { case _: Throwable => None }
    }

    // MID-SUITE re-calibration: the start-only probe cannot see
    // contention that arrives mid-run (r7's driver run calibrated
    // clean at 0.14 and then went 2.5× slow in the back half — a judge
    // had to re-measure by hand to adjudicate). One q12 run every
    // `calEvery` queries timestamps machine load ACROSS the pass, so a
    // contaminated segment is identifiable from the artifact alone:
    // segment sec >> the start median means every query timed in that
    // segment is load-inflated, not regressed. Probe runs sit between
    // the per-query metric snapshots, so their shuffle bytes are never
    // attributed to any query.
    val calEvery = 25
    val segCal = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    def calProbe(): Option[Double] =
      SparkEntry.queries.get("q12_distinct").flatMap { fn =>
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }

    // MEMO-INDEPENDENT calibration probe (r16 verdict #2): q12 loads
    // via Tables, so the r16 relation memo made the q12 probe itself
    // faster round-over-round (0.091 vs steady ~0.3 segments) — the
    // calibration unit was no longer round-stable. This probe is a
    // FIXED in-memory compute + one small shuffle (range → xxhash64 →
    // 1024-key groupBy → count): no file listing, no parquet, no memo
    // anywhere in its path, so its seconds measure machine load and
    // nothing else, every round, forever. Runs ALONGSIDE the q12 probe
    // (q12 keeps the r01–r16 artifacts comparable; vsPrev normalization
    // stays in q12 units against old-format priors).
    def fixedProbe(): Option[Double] =
      try {
        val t0 = System.nanoTime()
        spark.range(0L, 16L * 1000 * 1000)
          .selectExpr("pmod(xxhash64(id), 1024) AS k")
          .groupBy("k").count().count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => None }
    val fixedStart: Option[(Double, Seq[Double])] = {
      val runs = (1 to 3).flatMap(_ => fixedProbe())
      if (runs.size == 3) Some((runs.sorted.apply(1), runs)) else None
    }
    val segFixed = scala.collection.mutable.ArrayBuffer[(Int, Double)]()

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val shuffles = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Long)]()

    // STAGE-ATTRIBUTION pass (r14 verdict #2): force every shared-stage
    // memo at the timed dir BEFORE the per-query loop, each timed as its
    // own `stage:` pseudo-entry in the queries/metrics JSON. Without
    // this, a memoized corpus pass bills whichever consumer touches it
    // first, and sub-second scheduling jitter decides who that is —
    // r14's two same-HEAD runs flagged DISJOINT query sets at median
    // ratio 1.02 purely from this whipsaw. With it, per-query rows
    // measure steady-state work and stage cost is a named row, directly
    // comparable across runs. SPARK_GRAFT_NO_STAGES=1 restores the
    // legacy first-consumer billing (for drift archaeology only).
    val stageRows: Seq[(String, Double)] =
      if (sys.env.contains("SPARK_GRAFT_NO_STAGES")) Seq.empty
      else {
        val builders = graft.operators.PipelineQueries.sharedStageBuilders ++
          graft.operators.CoreQueries.sharedStageBuilders
        builders.map { case (name, build) =>
          System.err.println(s"[bench] $name")
          val before = snapMetrics()
          val t0 = System.nanoTime()
          try build(spark, sfDir)
          catch { case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .takeWhile(_ != '\n').take(200)
          }
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] $name%s done in $sec%.2f s")
          Thread.sleep(100)
          val after = snapMetrics()
          shuffles(name) = (after._1 - before._1, after._2 - before._2,
            after._3 - before._3)
          if (sec > 1.5) System.gc()
          name -> sec
        }
      }
    // sorted order: Map iteration order shifts when queries are added,
    // which re-attributes lingering cleanup (GC, broadcast/RDD release)
    // to a different successor query between rounds
    val times = queries.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), i) =>
      System.err.println(s"[bench] ${i + 1}/${queries.size} $name")
      val before = snapMetrics()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .takeWhile(_ != '\n').take(200)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] ${i + 1}/${queries.size} $name%s done in $sec%.2f s")
      Thread.sleep(100)
      val after = snapMetrics()
      shuffles(name) = (after._1 - before._1, after._2 - before._2,
        after._3 - before._3)
      // Deterministic GC-debt drain after any heavy query, OUTSIDE the
      // timing windows: round 10's q75–q79 regression block (2–8 s per
      // query) was the garbage + dead-block debt of the 4 s pagerank
      // at position 368 bleeding into its successors until the next
      // scheduled gc at position 375 — the fixpoints now free
      // superseded checkpoints at the source (GraphOps.free), and this
      // drain bounds whatever heap debt remains to the query that
      // created it. Threshold-gated so the ~300 sub-second queries
      // don't pay 395 full GCs of wall clock.
      if (sec > 1.5) System.gc()
      if ((i + 1) % calEvery == 0 && i + 1 < queries.size) {
        // periodic GC so the ContextCleaner actually releases dead
        // broadcast/RDD/checkpoint blocks mid-pass: cleanup is
        // weak-reference-driven, and in an 8g single-JVM suite the
        // old gen can hold hundreds of dead blocks for minutes —
        // measured r9: heavy queries ran 2-3x their isolated cost in
        // the back half of a 201-query pass without this (q84 8.6s
        // suite vs 3.3s isolated). The GC sits OUTSIDE every
        // per-query timing window, adjacent to the calibration probe
        // it also stabilizes.
        System.gc()
        calProbe().foreach(s => segCal += ((i + 1, s)))
        fixedProbe().foreach(s => segFixed += ((i + 1, s)))
      }
      name -> sec
    }
    calProbe().foreach(s => segCal += ((queries.size, s)))
    fixedProbe().foreach(s => segFixed += ((queries.size, s)))

    // SELF-ATTRIBUTING cross-round comparison (r13 verdict: a judge
    // could not tell drift from regression without re-measuring by
    // hand). For each query, normalize BOTH rounds into q12-units —
    // sec divided by the calibration probe covering that query's
    // segment (this round) / the recorded start median (prior round) —
    // and emit the ratio. A ratio > 1.5 on a non-trivial query is
    // flagged: that's "slower in machine-load-invariant units", i.e. a
    // real regression candidate, not contention. Prior artifact:
    // $SPARK_GRAFT_PREV_BENCH, else the highest-numbered
    // BENCH_r{N}[_local].json in the working directory.
    val prevBench: Option[(String, Double, Seq[(Int, Double)], Map[String, Double])] = {
      def parse(path: java.nio.file.Path): Option[(String, Double, Seq[(Int, Double)], Map[String, Double])] =
        try {
          val txt = Files.readString(path)
          val qStart = txt.indexOf("\"queries\":{")
          if (qStart < 0) return None
          val qEnd = txt.indexOf('}', qStart)
          val body = txt.substring(qStart + 11, qEnd)
          val kv = "\"([^\"]+)\":([-+0-9.Ee]+)".r
          val qs = kv.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          val cal = "\"medianSec\":([-+0-9.Ee]+)".r
            .findFirstMatchIn(txt).map(_.group(1).toDouble)
          // prior round's mid-suite q12 probes — the r16 verdict's
          // normalization-asymmetry fix: this round's times divide by
          // this round's covering segment probe, so the prior round's
          // must too (r16 divided prev by its START median while its
          // segments ran ~2× that, flattening every ratio). Parse only
          // the q12 `calibration` block's segments — the
          // `calibrationFixed` block (r17+) has same-shaped entries in
          // a different unit.
          val calEnd = txt.indexOf("\"calibrationFixed\"") match {
            case -1 => txt.length
            case i => i
          }
          val segs = """\{"afterQuery":(\d+),"sec":([-+0-9.Ee]+)\}""".r
            .findAllMatchIn(txt.substring(0, calEnd))
            .map(m => m.group(1).toInt -> m.group(2).toDouble).toSeq
          cal.filter(_ > 0).map(c => (path.getFileName.toString, c, segs, qs))
        } catch { case _: Throwable => None }
      sys.env.get("SPARK_GRAFT_PREV_BENCH")
        .map(Paths.get(_)).filter(Files.isRegularFile(_))
        .flatMap(parse)
        .orElse {
          val re = "BENCH_r(\\d+)(_local)?\\.json".r
          import scala.jdk.CollectionConverters._
          // Files.list holds an open directory handle — close it
          // (leaked once per bench invocation otherwise)
          val cands = scala.util.Using.resource(Files.list(Paths.get("."))) {
            _.iterator().asScala
              .flatMap { p =>
                p.getFileName.toString match {
                  case re(n, local) =>
                    // prefer the _local (clean-run) artifact at equal round
                    Some((n.toInt, if (local == null) 0 else 1, p))
                  case _ => None
                }
              }.toSeq.sortBy(t => (t._1, t._2))
          }
          cands.lastOption.flatMap(t => parse(t._3))
        }
    }
    val vsPrev: Option[(String, Seq[(String, Double)], Seq[String])] =
      for {
        (pname, pcal, psegs, pq) <- prevBench
        (startMed, _) <- calibration
      } yield {
        // segment probe covering query index i: first probe at or
        // after position i+1 (probes run after every calEvery-th
        // query and once at the end). SYMMETRIC for both rounds (r16
        // verdict #2): the prior round's seconds divide by ITS covering
        // segment probe too (query order is sorted-by-name in every
        // round and entries are only ever added, so the same index
        // addresses the same suite region; priors without segments
        // fall back to their start median as before).
        val probes = segCal.toSeq
        def calAt(i: Int): Double =
          probes.find(_._1 >= i + 1).map(_._2).getOrElse(startMed)
        def calAtPrev(i: Int): Double =
          psegs.find(_._1 >= i + 1).map(_._2).getOrElse(pcal)
        val ratios = times.zipWithIndex.flatMap { case ((name, sec), i) =>
          pq.get(name).filter(_ > 0.05).map { psec =>
            val r = (sec / math.max(calAt(i), 1e-3)) /
              (psec / math.max(calAtPrev(i), 1e-3))
            name -> math.rint(r * 1000) / 1000
          }
        }
        val flagged = ratios.collect {
          case (name, r) if r > 1.5 &&
            times.toMap.getOrElse(name, 0.0) > 0.5 => name
        }
        (pname, ratios, flagged)
      }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // stage rows join the queries JSON (named pseudo-entries) and the
    // total — the work is the same as before, only its attribution
    // moved out of the first-consumer queries into stable stage rows
    val ok = (stageRows ++ times).filter { case (n, _) => !errors.contains(n) }
    val qs = ok.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val calJson = calibration.map { case (med, runs) =>
      val segs = segCal.map { case (n, s) => s"""{"afterQuery":$n,"sec":$s}""" }
        .mkString("[", ",", "]")
      s""""calibration":{"query":"q12_distinct","medianSec":$med,""" +
      s""""runs":[${runs.mkString(",")}],"segments":$segs},"""
    }.getOrElse("")
    val calFixedJson = fixedStart.map { case (med, runs) =>
      val segs = segFixed.map { case (n, s) => s"""{"afterQuery":$n,"sec":$s}""" }
        .mkString("[", ",", "]")
      s""""calibrationFixed":{"probe":"range16M_xxhash_groupBy1024",""" +
      s""""medianSec":$med,"runs":[${runs.mkString(",")}],"segments":$segs},"""
    }.getOrElse("")
    val vsPrevJson = vsPrev.map { case (pname, ratios, flagged) =>
      val rj = ratios.map { case (k, v) => s"${jstr(k)}:$v" }
        .mkString("{", ",", "}")
      val fj = flagged.map(jstr).mkString("[", ",", "]")
      s""""vsPrev":{"prev":${jstr(pname)},"normRatios":$rj,""" +
        s""""flagged":$fj},"""
    }.getOrElse("")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s"""$calJson$calFixedJson$vsPrevJson"errors":$errJson,"n_ok":${ok.size},"n_err":${errors.size},""" +
      s""""sf":${jstr(sfDir)}}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    // COMPACT final summary line (r16 verdict #1): the full line above
    // is ~28 KB (one entry per query) and the driver's artifact retains
    // only a 2,000-char stdout tail, which truncates the line's head —
    // BENCH_r01..r16.json all ended up `parsed: null` and every PERF
    // comparison came back empty. This ≤1 KB line is printed LAST so it
    // always survives any tail window whole: totals, error count, the
    // memo-independent calibration (start + segment median), and the
    // flagged-regression list (capped at 20 names; flagged_n is the
    // true count). The full line is unchanged and still written to
    // bench_out.json — this is additive, not a methodology change.
    def med(xs: Seq[Double]): Option[Double] =
      if (xs.isEmpty) None else Some(xs.sorted.apply(xs.size / 2))
    val jnum = (o: Option[Double]) => o.map(_.toString).getOrElse("null")
    val flaggedAll = vsPrev.map(_._3).getOrElse(Seq.empty)
    val summaryLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${ok.size},""" +
      s""""n_err":${errors.size},""" +
      s""""cal_start":${jnum(fixedStart.map(_._1))},""" +
      s""""cal_segment_median":${jnum(med(segFixed.map(_._2).toSeq))},""" +
      s""""cal_q12_start":${jnum(calibration.map(_._1))},""" +
      s""""cal_q12_segment_median":${jnum(med(segCal.map(_._2).toSeq))},""" +
      s""""flagged":${flaggedAll.take(20).map(jstr).mkString("[", ",", "]")},""" +
      s""""flagged_n":${flaggedAll.size},"sf":${jstr(sfDir)}}"""
    println(summaryLine)
    Files.writeString(Paths.get("bench_summary.json"), summaryLine + "\n")
    // plan-quality side channel: per-query shuffle read/write + spill
    // (MB, approximate attribution — see listener note above)
    val mb = (b: Long) => b / 1048576.0
    val allTimes = (stageRows ++ times).toMap
    val metricsJson = shuffles.map { case (k, (r, w, sp)) =>
      s"""${jstr(k)}:{"sec":${allTimes.getOrElse(k, 0.0)},""" +
      s""""shuffleReadMB":${mb(r)},"shuffleWriteMB":${mb(w)},""" +
      s""""spillMB":${mb(sp)}}"""
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get("bench_metrics.json"), metricsJson + "\n")
    if (errors.nonEmpty)
      System.err.println(s"[bench] FAILED queries: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
