package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q312 table digest: independent plain-Scala recompute + the
  * diff-localization property the digest exists for. */
class TableDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def md5Prefix10(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(10)
    java.lang.Long.parseLong(hex, 16)
  }

  private def rowHash(k: Long, ln: Int, q: Long, p: Long,
      rf: String, ls: String): Long =
    md5Prefix10(s"r:$k:$ln:$q:$p:$rf:$ls")

  test("q312: bucket digests match a direct recompute; root sums them") {
    val rows = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_returnflag"), col("l_linestatus"))
      .as[(Long, Int, Long, Long, String, String)].collect()
    val expect = rows.groupBy(_._1 % 64).view.mapValues { rs =>
      (rs.length.toLong,
        rs.map(r => rowHash(r._1, r._2, r._3, r._4, r._5, r._6)).sum)
    }.toMap
    val out = SparkEntry.queries("q312_table_digest")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val (root, buckets) = out.partition(_._1 == -1L)
    assert(buckets.length == expect.size)
    buckets.foreach { case (b, n, d) =>
      assert((n, d) == expect(b), s"bucket $b")
    }
    assert(root.head._2 == rows.length)
    assert(root.head._3 == buckets.map(_._3).sum)
  }

  test("q321: changed set is exactly the buckets the sparse trickle touches") {
    val keys = graft.sources.Tables.orders(spark, dir)
      .select("o_orderkey").as[Long].collect()
    val touched = keys.filter(k =>
      k % 977 == 0 || k % 983 == 0 || k % 991 == 0)
      .flatMap(k => Seq(k % 64) ++
        (if (k % 991 == 0) Seq((k + 10000000L) % 64) else Nil)).toSet
    val out = SparkEntry.queries("q321_digest_diff")(spark, dir)
      .select("bucket", "row_delta").as[(Long, Long)].collect()
    assert(out.map(_._1).toSet == touched,
      s"changed buckets ${out.map(_._1).toSet} vs touched $touched")
    assert(out.map(_._1).toSet.size < 64,
      "the sparse trickle must leave most buckets untouched")
    // net row delta across buckets = inserts - deletes
    val inserts = keys.count(_ % 991 == 0)
    val deletes = keys.count(_ % 977 == 0)
    assert(out.map(_._2).sum == inserts - deletes)
  }

  test("digest localizes a one-row change to exactly one bucket") {
    val rows = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_returnflag"), col("l_linestatus"))
      .as[(Long, Int, Long, Long, String, String)].collect()
    def digests(rs: Seq[(Long, Int, Long, Long, String, String)]) =
      rs.groupBy(_._1 % 64).view.mapValues(
        _.map(r => rowHash(r._1, r._2, r._3, r._4, r._5, r._6)).sum).toMap
    val base = digests(rows.toSeq)
    val perturbed = digests(rows.toSeq.updated(0,
      rows(0).copy(_3 = rows(0)._3 + 1)))
    val changed = base.keySet.filter(b => base(b) != perturbed(b))
    assert(changed == Set(rows(0)._1 % 64),
      s"one-row change must move exactly its bucket, got $changed")
  }
}
