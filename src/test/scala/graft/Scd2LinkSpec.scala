package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q324 Adamic-Adar link prediction, q325 SCD2 build, q326 PIT join. */
class Scd2LinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q324: AA score on a planted wedge graph is the closed form") {
    // Path graph 1-2-3 plus hub 4 adjacent to {1,3}: the non-adjacent
    // pair (1,3) has common neighbors {2, 4} -> aa = 1/ln(2) + 1/ln(2)
    // (deg 2 = {1,3}, deg 4 = {1,3}); pair (2,4) shares {1, 3} with
    // deg(1) = deg(3) = 2 -> same score.
    val co = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L))
      .toDF("a", "b")
    val adj = co.select(col("a").as("z"), col("b").as("x"))
      .unionAll(co.select(col("b").as("z"), col("a").as("x")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg"))
    val mid = adj.join(deg.filter(col("deg") <= 256), Seq("z"))
    val wedges = mid
      .join(mid.select(col("z"), col("x").as("y"), col("deg").as("d2")),
        Seq("z"))
      .filter(col("x") < col("y"))
      .groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("n_common"),
        sum(lit(1.0) / log(col("deg").cast("double"))).as("aa_raw"))
    val out = wedges.join(co, Seq("a", "b"), "left_anti")
      .as[(Long, Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    val w = 2.0 / math.log(2.0)
    assert(out.length == 2)
    assert(out(0)._1 == 1L && out(0)._2 == 3L && out(0)._3 == 2L)
    assert(math.abs(out(0)._4 - w) < 1e-12)
    assert(out(1)._1 == 2L && out(1)._2 == 4L && out(1)._3 == 2L)
    assert(math.abs(out(1)._4 - w) < 1e-12)
  }

  test("q324 gate frame: non-adjacent, ordered, capped at 20") {
    val out = SparkEntry.queries("q324_adamic_adar")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 20)
    // descending on the pinned score; all pairs canonical a<b
    assert(out.sliding(2).forall {
      case Array(x, y) => x._4 >= y._4; case _ => true
    })
    out.foreach { case (a, b, nc, aa) =>
      assert(a < b && nc >= 1 && aa > 0)
    }
  }

  test("q325: runs collapse and the version timeline tiles the stream") {
    val out = SparkEntry.queries("q325_scd2_build")(spark, dir)
      .select("user_id", "version", "state", "valid_from_us",
        "valid_to_us", "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Int)]
      .collect().groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // versions are 1..k dense; exactly one open (current) row at the
      // end; each valid_to equals the successor's valid_from; no two
      // consecutive versions share a state (else they were one run)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length.toLong))
      assert(sorted.init.forall(_._7 == 0) && sorted.last._7 == 1)
      assert(sorted.last._5.isEmpty)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x._5.contains(y._4)); assert(x._3 != y._3)
        case _ =>
      }
    }
  }

  test("q326: per-state purchase counts cover every purchase exactly once") {
    val out = SparkEntry.queries("q326_scd2_pit")(spark, dir)
      .select("state", "n_purchases")
      .as[(String, Long)].collect()
    val purchases = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_._2).sum == purchases)
    // the dimension states are the four non-purchase event types (+
    // possibly 'none' for pre-first-state purchases)
    val allowed = Set("click", "error", "signup", "view", "none")
    assert(out.forall(r => allowed.contains(r._1)))
  }

  test("q326: PIT lookup on a hand-built timeline") {
    // user 10: states view@t0, click@t5; purchases at t3 (-> view),
    // t5 (-> click, boundary from_us <= us), t1 before any state for
    // user 20 (-> none)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 10L, "view", 1.0, ""),
      (2L, ts(5), 10L, "click", 1.0, ""),
      (3L, ts(3), 10L, "purchase", 10.0, ""),
      (4L, ts(5), 10L, "purchase", 20.0, ""),
      (5L, ts(1), 20L, "purchase", 5.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.createOrReplaceTempView("__scd2_ev")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val e = ev.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
    val dim = e.filter(col("event_type") =!= "purchase")
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("version", sum(col("chg")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(first(col("event_type")).as("state"), min(col("us")).as("from_us"))
      .withColumn("to_us", lead(col("from_us"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("version")))
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("f_user"), col("event_id"),
        col("us").as("f_us"), col("value"))
    val got = facts.join(dim,
        col("f_user") === dim("user_id") &&
          col("from_us") <= col("f_us") &&
          (col("to_us").isNull || col("f_us") < col("to_us")), "left")
      .select(col("event_id"), coalesce(col("state"), lit("none")).as("s"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((3L, "view"), (4L, "click"), (5L, "none")))
  }
}
