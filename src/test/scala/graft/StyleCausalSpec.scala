package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q336 Burrows' Delta, q337 entropy rate, q338 stratified ATE. */
class StyleCausalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q336 gate frame: symmetric-positive distance over all source pairs") {
    val out = SparkEntry.queries("q336_burrows_delta")(spark, dir)
      .select("sa", "sb", "n_terms", "delta")
      .as[(String, String, Long, Double)].collect()
    assert(out.length == 190) // C(20,2)
    out.foreach { case (sa, sb, nt, d) =>
      assert(sa < sb && nt >= 1 && nt <= 30 && d >= 0.0)
    }
    // same n_terms everywhere: the term panel is global, not per-pair
    assert(out.map(_._3).distinct.length == 1)
  }

  test("q337: two-state deterministic chain has zero entropy rate") {
    // a->b->a->b...: each state has exactly one successor
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val ev = (1 to 20).map(i =>
        (i.toLong, ts(i), 1L, if (i % 2 == 0) "a" else "b", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val trans = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type").as("t"))
      .withColumn("prev", lag(col("t"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "t").agg(count(lit(1)).as("c_ij"))
    val h = trans
      .join(trans.groupBy("prev").agg(sum("c_ij").as("c_i")), Seq("prev"))
      .agg(sum(-col("c_ij").cast("double") / col("c_i") *
        log(col("c_ij").cast("double") / col("c_i"))).as("h"))
      .head().getDouble(0)
    assert(h == 0.0)
  }

  test("q337 gate frame: chain row is the pi-weighted state mean") {
    val out = SparkEntry.queries("q337_entropy_rate")(spark, dir)
      .select("state", "n_from", "pi", "h_nats")
      .as[(String, Long, Double, Double)].collect()
    val chain = out.filter(_._1 == "__chain")
    val states = out.filter(_._1 != "__chain")
    assert(chain.length == 1 && states.length == 5)
    assert(chain.head._2 == states.map(_._2).sum)
    val mix = states.map(r => r._3 * r._4).sum
    assert(math.abs(chain.head._4 - mix) < 1e-3)
    // 5 uniform-ish event types: entropy near ln(5), never above
    states.foreach(r => assert(r._4 >= 0.0 && r._4 <= math.log(5.0) + 1e-9))
  }

  test("q338: planted constant uplift is recovered exactly") {
    // stratum 1: control mean 100, treated 130; stratum 2: 200 vs 230
    // -> every per-stratum effect 30, overall 30.
    val base = Seq(
      (1L, 1L, 100.0, 0L), (2L, 1L, 100.0, 0L), (3L, 1L, 130.0, 1L),
      (4L, 2L, 200.0, 0L), (5L, 2L, 230.0, 1L), (6L, 2L, 230.0, 1L))
      .toDF("id", "nation", "price", "treat")
      .select(col("nation"), col("treat"),
        round(col("price") * 100).cast("long").as("y"))
    val strata = base.groupBy("nation")
      .agg(count(lit(1)).as("n"), sum("treat").as("n_t"),
        sum(when(col("treat") === 1, col("y")).otherwise(0L)).as("sy_t"),
        sum(when(col("treat") === 0, col("y")).otherwise(0L)).as("sy_c"))
      .filter(col("n_t") > 0 && col("n_t") < col("n"))
      .withColumn("mean_t",
        col("sy_t").cast("double") / col("n_t").cast("double") / 100)
      .withColumn("mean_c", col("sy_c").cast("double") /
        (col("n") - col("n_t")).cast("double") / 100)
    val effects = strata
      .select(col("nation"), (col("mean_t") - col("mean_c")).as("eff"))
      .as[(Long, Double)].collect().toMap
    assert(effects(1L) == 30.0 && effects(2L) == 30.0)
    val overall = strata
      .crossJoin(broadcast(strata.agg(sum("n").as("nn"))))
      .agg(sum(col("n").cast("double") / col("nn") *
        (col("mean_t") - col("mean_c"))))
      .head().getDouble(0)
    assert(math.abs(overall - 30.0) < 1e-9)
  }

  test("q338 gate frame: overall row reweights the kept strata") {
    val out = SparkEntry.queries("q338_strat_ate")(spark, dir)
      .select("nation", "n", "n_t", "effect")
      .as[(Long, Long, Long, Double)].collect()
    val overall = out.filter(_._1 == -1L)
    val strata = out.filter(_._1 >= 0L)
    assert(overall.length == 1 && strata.nonEmpty)
    assert(overall.head._2 == strata.map(_._2).sum)
    assert(overall.head._3 == strata.map(_._3).sum)
    // overall effect within the per-stratum effect envelope
    val (lo, hi) = (strata.map(_._4).min, strata.map(_._4).max)
    assert(overall.head._4 >= lo - 1e-9 && overall.head._4 <= hi + 1e-9)
    strata.foreach { case (_, n, nt, _) => assert(nt > 0 && nt < n) }
  }
}
