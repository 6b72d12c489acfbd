package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Html

/** HTML wrap + link-density extraction (q163): structural invariants
  * of the generator and exact recovery of the main text. */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extractMain drops nav and link-farm blocks, keeps paragraph text exactly") {
    val docs = Seq((7L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val html = Html.htmlFromDocs(docs, "doc_id", "text")
      .select("html").as[String].collect()(0)
    assert(html.startsWith("<body><div class=\"nav\">"))
    assert(html.endsWith("</body>"))

    val out = Html.extractMain(Html.htmlFromDocs(docs, "doc_id", "text"),
      "doc_id").collect()(0)
    val nBlocks = out.getAs[Long]("n_blocks")
    val kept = out.getAs[Long]("n_kept")
    val mainMd5 = out.getAs[String]("main_md5")
    // 4 words -> one content block + the nav block
    assert(nBlocks == 2L)
    // nav is link-dense and must be dropped; the single content block
    // is either a kept paragraph (md5 of the words) or a dropped menu
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (kept == 1L) assert(mainMd5 == m("alpha beta gamma delta"))
    else { assert(kept == 0L); assert(mainMd5 == m("")) }
  }

  test("extraction is exact over many docs: visible main text equals the paragraph words") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Html.extractMain(Html.htmlFromDocs(docs, "doc_id", "text"),
      "doc_id")
    // reconstruct expected from the text directly (generator contract):
    // words in 10-blocks, block kept iff md5 draw says paragraph
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h8(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16)
    def m(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = texts.map { case (id, t) =>
      val w = t.trim.split("\\s+").toSeq
      val k = math.ceil(w.size / 10.0).toInt
      val keptBlocks = (0 until k).filter(i => h8(s"blk:$id:$i") % 3 != 0)
        .map(i => w.slice(i * 10, i * 10 + 10).mkString(" "))
      id -> m(keptBlocks.mkString(" "))
    }.toMap
    val gotMap = got.select("doc_id", "main_md5").as[(Long, String)]
      .collect().toMap
    assert(gotMap.size == expect.size)
    val bad = expect.filter { case (id, e) => gotMap(id) != e }
    assert(bad.isEmpty, s"mismatched docs: ${bad.keys.take(5)}")
    // boiler_frac strictly between 0 and 1 somewhere (nav always drops)
    val fr = got.select("boiler_frac").as[Double].collect()
    assert(fr.forall(f => f > 0.0 && f <= 1.0))
  }

  test("a block at exactly 0.5 link density is kept (boundary contract)") {
    // craft html directly: visible "xyxy", anchor text "xy" -> 0.5
    val df = Seq((1L, "<body><p>xy<a href=\"#\">xy</a></p></body>"))
      .toDF("doc_id", "html")
    val out = Html.extractMain(df, "doc_id").collect()(0)
    assert(out.getAs[Long]("n_kept") == 1L)
  }
}
