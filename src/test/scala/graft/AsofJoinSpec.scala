package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsofJoin, CorpusOps}

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"),
    (2L, 50L, "l50")).toDF("k", "t", "lv")
  private lazy val right = Seq(
    (1L, 10L, "r10"), (1L, 15L, "r15"),
    (2L, 99L, "r99")).toDF("k", "t", "rv")

  test("asofBackward: latest right at-or-before, equal time matches, no-match is null") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t")
      .select(col("k"), col("t"), col("asof.rv"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(out == Set(
      (1L, 10L, Some("r10")),  // equal time matches (>= contract)
      (1L, 20L, Some("r15")),  // latest of the two prior rights
      (1L, 5L, None),          // nothing at or before
      (2L, 50L, None)))        // right exists but only in the future
  }

  test("asofBackward carries the WHOLE right row and preserves left columns") {
    val row = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t")
      .filter(col("t") === 20)
      .select(col("lv"), col("asof.k"), col("asof.t"), col("asof.rv"))
      .as[(String, Long, Long, String)].head()
    assert(row == ("l20", 1L, 15L, "r15"))
  }

  test("bandedRangeJoin: inclusive boundary, cross-bucket pairs, no duplicates") {
    import graft.operators.RangeJoin
    val l = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 100L, "c"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 150L, "x"), (1L, 199L, "y"), (2L, 201L, "z"))
      .toDF("k", "rt", "rv")
    val out = RangeJoin.bandedRangeJoin(l, r, Seq("k"), "t", "rt", maxGap = 100L)
      .select(col("lv"), col("match.rv")).as[(String, String)].collect().toList
    // (a,x) 50, (a,y) 99, (b,y) 51; (b,x) gap exactly 100 — inclusive,
    // and x sits in bucket 1 while b sits in bucket 2 (cross-bucket);
    // (c,z) gap 101 — excluded; nothing appears twice
    assert(out.sorted ==
      List(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")))
  }

  test("asofForward: earliest right at-or-after, equal time matches, brute-force parity") {
    val out = AsofJoin.asofForward(left, right, Seq("k"), "t", "t")
      .select(col("k"), col("t"), col("asof.rv"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(out == Set(
      (1L, 10L, Some("r10")),  // equal time matches (<= contract)
      (1L, 20L, None),         // nothing at or after
      (1L, 5L, Some("r10")),   // earliest of the two later rights
      (2L, 50L, Some("r99"))))
    // brute-force parity on random data
    val rng = new scala.util.Random(59)
    val lefts = Seq.tabulate(150)(i =>
      (i.toLong, 1L + rng.nextInt(4), rng.nextInt(1000).toLong))
    val rights = Seq.fill(200)((1L + rng.nextInt(4), rng.nextInt(1000).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") }
    val got = AsofJoin.asofForward(lefts.toDF("lid", "k", "t"),
        rights.toDF("k", "t", "rv"), Seq("k"), "t", "t")
      .select(col("lid"), col("asof.rv"))
      .as[(Long, Option[String])].collect().toMap
    val byKey = rights.groupBy(_._1)
    lefts.foreach { case (lid, k, lt) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 >= lt).sortBy(_._2).headOption.map(_._3)
      assert(got(lid) == want, s"left $lid (k=$k, t=$lt)")
    }
  }

  test("asofBackward equals the brute-force latest-at-or-before on random data") {
    val rng = new scala.util.Random(53)
    val lefts = Seq.tabulate(150)(i =>
      (i.toLong, 1L + rng.nextInt(4), rng.nextInt(1000).toLong))
    val rights = Seq.fill(200)((1L + rng.nextInt(4), rng.nextInt(1000).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") }
    val lDf = lefts.toDF("lid", "k", "t")
    val rDf = rights.toDF("k", "t", "rv")
    val got = AsofJoin.asofBackward(lDf, rDf, Seq("k"), "t", "t")
      .select(col("lid"), col("asof.rv"))
      .as[(Long, Option[String])].collect().toMap
    val byKey = rights.groupBy(_._1)
    lefts.foreach { case (lid, k, lt) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= lt)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(lid) == want,
        s"left $lid (k=$k, t=$lt): got ${got(lid)}, want $want")
    }
  }

  test("bandedRangeJoin equals the brute-force inequality join on random data") {
    import graft.operators.RangeJoin
    val rng = new scala.util.Random(59)
    val lefts = Seq.tabulate(120)(i =>
      (100L + i, 1L + rng.nextInt(3), rng.nextInt(5000).toLong))
    val rights = Seq.tabulate(120)(i =>
      (500L + i, 1L + rng.nextInt(3), rng.nextInt(5000).toLong))
    val gap = 137L // deliberately not a divisor of anything
    val got = RangeJoin.bandedRangeJoin(
        lefts.toDF("lid", "k", "lt"), rights.toDF("rid", "k", "rt"),
        Seq("k"), "lt", "rt", maxGap = gap)
      .select(col("lid"), col("match.rid"))
      .as[(Long, Long)].collect().toSet
    val want = (for {
      (lid, lk, lt) <- lefts
      (rid, rk, rt) <- rights
      if lk == rk && math.abs(lt - rt) <= gap
    } yield (lid, rid)).toSet
    assert(got == want,
      s"missing ${want -- got}, extra ${got -- want}")
  }

  test("resampleForwardFill: absolute-aligned grid, forward fill, span-less keys dropped") {
    import graft.operators.TimeSeries
    val events = Seq(
      (1L, 100L, "a"), (1L, 250L, "b"), (1L, 700L, "c"),
      (2L, 50L, "x")) // span [50,50]: no multiple of 200 inside -> no grid
      .toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(events, Seq("k"), "t", stepUs = 200L)
      .select(col("k"), col("grid_t"), col("state.v"))
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 200L, "a"),  // last event at-or-before 200 is t=100
      (1L, 400L, "b"),
      (1L, 600L, "b"))) // 700 > hi-grid point 600; key 2 has no grid row
  }

  test("resampleForwardFill: a grid point at an event time takes that event (>= contract)") {
    import graft.operators.TimeSeries
    val events = Seq((1L, 200L, "on-grid"), (1L, 399L, "later")).toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(events, Seq("k"), "t", stepUs = 200L)
      .select(col("grid_t"), col("state.v")).as[(Long, String)].collect().toSet
    assert(out == Set((200L, "on-grid")))
  }

  test("concurrencySweep: inclusive endpoints, merged boundaries, bucketed cumsum equals naive") {
    import graft.operators.TimeSeries
    val iv = Seq((0L, 10L), (5L, 15L), (20L, 30L), (31L, 40L))
      .toDF("s", "e")
    // tiny bucket forces the two-level path across many buckets
    val got = TimeSeries.concurrencySweep(iv, "s", "e", bucketUs = 7L)
      .as[(Long, Long)].collect().toMap
    // deltas: 0:+1 5:+1 11:-1 16:-1 20:+1 31:(-1+1)=0 41:-1
    assert(got == Map(0L -> 1L, 5L -> 2L, 11L -> 1L, 16L -> 0L,
      20L -> 1L, 31L -> 1L, 41L -> 0L),
      s"adjacent end+1/start must merge to a net-zero delta row, got $got")
  }

  test("fuzzyPairs: blocked edit-distance pairs over distinct names") {
    val df = Seq("red widget", "blue widget", "red widget", "red bolt")
      .toDF("nm")
    val out = CorpusOps.fuzzyPairs(df, "nm",
        n => element_at(split(n, " "), -1), maxDist = 4)
      .as[(String, String, Int)].collect().toSet
    // only the widget block pairs; lev(blue,red)=4; bolt is alone
    assert(out == Set(("blue widget", "red widget", 4)))
  }

  test("timeDecayedSum: max-anchored half-life weights, freshness semantics") {
    import graft.operators.TimeSeries
    val h = 100L
    val ev = Seq(
      (1L, 0L, 10.0), (1L, 100L, 10.0), (1L, 200L, 10.0), // 2,1,0 half-lives old
      (2L, 500L, 4.0), (2L, 500L, 6.0))                   // all at the anchor
      .toDF("user_id", "us", "value")
    val got = TimeSeries.timeDecayedSum(ev, "user_id", "us", "value", h)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // user 1: 10*2^-2 + 10*2^-1 + 10*2^0 = 17.5; freshness 17.5/30
    assert(got(1L) == ((3L, 17.5, 0.5833)), s"got ${got(1L)}")
    // simultaneous events: every weight is 2^0 = 1 -> freshness exactly 1
    assert(got(2L) == ((2L, 10.0, 1.0)), s"got ${got(2L)}")
  }

  test("native AsofJoinExec is row-identical to the composition on adversarial data") {
    // same generator as the composition's brute-force test, plus
    // deliberate edge rows: equal times, key gaps, right-only keys,
    // left-only keys, and duplicated left timestamps
    val rng = new scala.util.Random(83)
    val lefts = Seq.tabulate(300)(i =>
      (i.toLong, 1L + rng.nextInt(6), rng.nextInt(500).toLong)) ++
      Seq((900L, 99L, 10L), (901L, 99L, 10L))       // left-only key, dup t
    val rights = Seq.fill(300)((1L + rng.nextInt(6), rng.nextInt(500).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) } ++
      Seq((98L, 1L, 7777L))                          // right-only key
    val lDf = lefts.toDF("lid", "k", "t")
    val rDf = rights.toDF("rk", "rt", "rv")
    val native = graft.plans.AsofNative
      .asofBackward(lDf, rDf, "k", "t", "rk", "rt")
      .select(col("lid"), col("rv"), col("rt"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap

    val comp = AsofJoin.asofBackward(lDf,
        rDf.withColumnRenamed("rk", "k").withColumnRenamed("rt", "t"),
        Seq("k"), "t", "t")
      .select(col("lid"), col("asof.rv"), col("asof.t"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(native == comp,
      s"diff=${(native.toSet -- comp.toSet).take(5)} / ${(comp.toSet -- native.toSet).take(5)}")

    // the physical plan really is the custom operator: one exec node,
    // both children shuffled+sorted by EnsureRequirements
    val plan = graft.plans.AsofNative
      .asofBackward(lDf, rDf, "k", "t", "rk", "rt")
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsofJoin"), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly one shuffle per side:\n${plan.take(2000)}")
  }

  test("native BandJoinExec is row-identical to the composition on adversarial data") {
    // random band data plus deliberate edges: |dt| exactly == gap
    // (inclusive), equal times, key gaps, one-side-only keys, and a
    // dense same-time cluster (band buffer holds many rows)
    val rng = new scala.util.Random(91)
    val gap = 50L
    val lefts = Seq.tabulate(250)(i =>
      (i.toLong, 1L + rng.nextInt(5), rng.nextInt(400).toLong)) ++
      Seq((800L, 7L, 100L), (801L, 7L, 150L),       // boundary: dt == gap
        (810L, 8L, 5L)) ++                           // left-only key
      Seq.tabulate(10)(i => (900L + i, 9L, 42L))     // same-time cluster
    val rights = Seq.tabulate(250)(i =>
      (1L + rng.nextInt(5), rng.nextInt(400).toLong, 5000L + i)) ++
      Seq((7L, 50L, 9000L),                          // 100-50 == gap
        (6L, 1L, 9100L)) ++                          // right-only key
      Seq.tabulate(10)(i => (9L, 42L, 9200L + i))
    val lDf = lefts.toDF("lid", "k", "t")
    val rDf = rights.toDF("rk", "rt", "rv")
    val native = graft.plans.RangeNative
      .bandJoin(lDf, rDf, "k", "t", "rk", "rt", gap)
      .select(col("lid"), col("rv"), col("rt"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val comp = graft.operators.RangeJoin.bandedRangeJoin(lDf,
        rDf.withColumnRenamed("rk", "k").withColumnRenamed("rt", "rt2"),
        Seq("k"), "t", "rt2", maxGap = gap)
      .select(col("lid"), col("match.rv"), col("match.rt2"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(native == comp,
      s"native=${native.size} comp=${comp.size} " +
        s"diff=${(native.toSet -- comp.toSet).take(5)} / " +
        s"${(comp.toSet -- native.toSet).take(5)}")
    assert(native.nonEmpty)
    // boundary pair present (inclusive contract)
    assert(native.contains((800L, 9000L, 50L)))
    // physical shape: the custom exec with one shuffle per side
    val plan = graft.plans.RangeNative
      .bandJoin(lDf, rDf, "k", "t", "rk", "rt", gap)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BandJoin"), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly one shuffle per side:\n${plan.take(2000)}")
  }

  test("native band join: empty sides and null keys/times never match") {
    val l = Seq((1L, Option(5L), Option(10L)), (2L, None, Option(10L)),
      (3L, Option(5L), None)).toDF("lid", "k", "t")
    val r = Seq((Option(5L), Option(8L), 42L), (None, Option(9L), 43L),
      (Option(5L), None, 44L)).toDF("rk", "rt", "rv")
    val out = graft.plans.RangeNative
      .bandJoin(l, r, "k", "t", "rk", "rt", gap = 5L)
      .select(col("lid"), col("rv")).as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 42L)), s"got $out")
    assert(graft.plans.RangeNative.bandJoin(l.where(lit(false)), r,
      "k", "t", "rk", "rt", 5L).count() == 0L)
    assert(graft.plans.RangeNative.bandJoin(l, r.where(lit(false)),
      "k", "t", "rk", "rt", 5L).count() == 0L)
  }

  test("native as-of: empty sides and null keys/times follow SQL semantics") {
    val l = Seq((1L, Option(5L), Option(10L)), (2L, None, Option(10L)),
      (3L, Option(5L), None)).toDF("lid", "k", "t")
    val r = Seq((Option(5L), Option(8L), 42L), (None, Option(1L), 43L),
      (Option(5L), None, 44L)).toDF("rk", "rt", "rv")
    val out = graft.plans.AsofNative
      .asofBackward(l, r, "k", "t", "rk", "rt")
      .select(col("lid"), col("rv"))
      .as[(Long, Option[Long])].collect().toMap
    // only the fully-non-null pairing matches; null key/time rows on
    // either side never join (the documented contract)
    assert(out == Map(1L -> Some(42L), 2L -> None, 3L -> None))

    val empty = l.where(lit(false))
    val outE = graft.plans.AsofNative
      .asofBackward(empty, r, "k", "t", "rk", "rt").count()
    assert(outE == 0L)
    val outR = graft.plans.AsofNative
      .asofBackward(l, r.where(lit(false)), "k", "t", "rk", "rt")
      .select(col("lid"), col("rv"))
      .as[(Long, Option[Long])].collect().toMap
    assert(outR == Map(1L -> None, 2L -> None, 3L -> None))
  }
}
