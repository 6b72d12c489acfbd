package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q306 Cochran–Armitage + q307 hubness: independent plain-Scala
  * recomputes from the raw tables. */
class TrendHubnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("q306: z matches a direct trend recompute") {
    val rows = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .select(dayofweek(col("ts")) - 1, col("event_type"))
      .as[(Int, String)].collect()
    val byW = rows.groupBy(_._1)
    val n = rows.length.toLong
    val r = rows.count(_._2 == "purchase").toLong
    val swr = byW.map { case (w, g) =>
      w.toLong * g.count(_._2 == "purchase") }.sum
    val swn = byW.map { case (w, g) => w.toLong * g.length }.sum
    val swwn = byW.map { case (w, g) => w.toLong * w * g.length }.sum
    val z = (n * swr - r * swn).toDouble * math.sqrt(n.toDouble) /
      math.sqrt(r.toDouble * (n - r) * (n * swwn - swn * swn).toDouble)
    val got = SparkEntry.queries("q306_cochran_armitage")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == byW.size && got._2 == n && got._3 == r)
    assert(got._4 == round4(z), s"z ${got._4} vs $z")
    assert(got._5 == round4(z * z))
  }

  test("q307: in-degree facts match a direct kNN recompute") {
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    // fixed-size md5 query sample: the 64 smallest (md5("hubq:"+id),
    // id) — the corpus-size-independent sample the engine uses (a
    // modulus sample grows with the corpus; r14 second-decade lesson)
    def md5Long(s: String): Long =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    val queries = vecs
      .sortBy { case (id, _) => (md5Long(s"hubq:$id"), id) }.take(64)
    val indeg = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    queries.foreach { case (qid, qe) =>
      vecs.filter(_._1 != qid)
        .map { case (cid, ce) => (cid, cos(qe, ce)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(5)
        .foreach { case (cid, _) => indeg(cid) += 1 }
    }
    val ds = vecs.map(v => indeg(v._1))
    val got = SparkEntry.queries("q307_hubness")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == queries.length && got._2 == vecs.length)
    assert(got._3 == ds.count(_ > 0) && got._4 == ds.max)
    val top10 = ds.sorted.reverse.take(10).sum
    // top-10 mass ties: the engine breaks in-degree ties by vec_id;
    // any 10 points at the tied boundary give the same SUM
    assert(got._6 == round4(top10.toDouble / (queries.length * 5)))
    val n = ds.length.toDouble
    val mu = ds.sum / n
    val m2 = ds.map(d => (d - mu) * (d - mu)).sum / n
    val m3 = ds.map(d => math.pow(d - mu, 3)).sum / n
    assert(math.abs(got._5 - m3 / (m2 * math.sqrt(m2))) < 1e-3,
      s"skew ${got._5} vs ${m3 / (m2 * math.sqrt(m2))}")
  }
}
