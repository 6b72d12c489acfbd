package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoreQueries => C}

/** Wave 46 (q415–q416): temporal-split Markov eval and the Simpson's
  * sign-flip audit — both replayed independently on the driver from
  * the raw collected rows. */
class Wave46Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q415: accuracy equals a hand-fit argmax transition model") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val cut = java.sql.Date.valueOf("2024-01-21")
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2.getTime, r._3)).sliding(2).collect {
        case Array(a, b) =>
          (a._4, b._4, new java.sql.Date(b._2.getTime).toString >= cut.toString)
      }
    }.toSeq
    val fit = trans.filter(!_._3).groupBy(t => (t._1, t._2))
      .map { case (k, v) => (k, v.size) }
    val pred = fit.groupBy(_._1._1).map { case (prev, m) =>
      prev -> m.toSeq.map { case ((_, nx), n) => (-n, nx) }.min._2
    }
    val test = trans.filter(_._3)
    val exp = test.groupBy(_._1).map { case (prev, rows) =>
      prev -> (rows.size.toLong,
        rows.count(r => pred.get(prev).contains(r._2)).toLong)
    }
    val got = C.markovEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == exp.size)
    got.foreach { case (prev, p, nTest, nCorrect) =>
      assert(pred.get(prev).contains(p), s"pred for $prev")
      assert((nTest, nCorrect) == exp(prev), s"counts for $prev")
    }
  }

  test("q417: k-truss equals a driver-side peel and has converged") {
    val pp = graft.sources.Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = pp.groupBy(_._1).values.flatMap { rows =>
      val parts = rows.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = (es.toSeq ++ es.toSeq.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      es.toSeq.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size
      }.toMap
    }
    for (_ <- 0 until 3)
      edges = support(edges).filter(_._2 >= 2).keySet
    // fixed-iteration convention: verify the peel actually CONVERGED
    // at this scale, so "after 3 peels" is the true 4-truss
    assert(support(edges).filter(_._2 >= 2).keySet == edges)
    val expSup = support(edges)
    val got = graft.operators.CoreQueries.ktrussQuery(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.map(_._1).toSet == edges)
    got.foreach { case (e, sup) =>
      assert(sup == expSup(e), s"support of $e")
      assert(sup >= 2)
    }
  }

  test("q416: covariance signs equal an exact BigInt replication") {
    val spend = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = graft.sources.Tables.customer(spark, dir)
      .join(graft.sources.Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"), floor(col("c_acctbal"))
        .cast("long"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), spend.getOrElse(r.getLong(0), 0L)))
    def sign(rows: Seq[(BigInt, BigInt)]): Int = {
      val n = BigInt(rows.size)
      val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
      val sxy = rows.map(r => r._1 * r._2).sum
      (n * sxy - sx * sy).signum
    }
    val pooledSign = sign(cust.toSeq.map(r => (BigInt(r._2), BigInt(r._3))))
    val got = C.simpsonsFlip(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    val pooledRow = got.find(_._1 == "pooled").get
    assert(pooledRow._3 == pooledSign && !pooledRow._4)
    cust.groupBy(_._1).foreach { case (nation, rows) =>
      val s = sign(rows.toSeq.map(r => (BigInt(r._2), BigInt(r._3))))
      val row = got.find(_._1 == s"nation:$nation").get
      assert(row._2 == rows.size && row._3 == s)
      assert(row._4 == (s != 0 && pooledSign != 0 && s != pooledSign))
    }
  }
}
