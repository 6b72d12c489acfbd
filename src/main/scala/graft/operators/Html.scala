package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MysqlFunctions

/** HTML main-text extraction — the boilerplate-removal stage every web
  * training corpus runs (CCNet / jusText / trafilatura family): strip
  * markup per block, score each block by LINK DENSITY (anchor-text
  * chars / visible chars), keep low-density blocks as the document's
  * main text. No HTML library exists in this environment and none is
  * needed: the generator emits a constrained-but-honest HTML subset
  * (nav div, paragraph blocks, link-farm menu divs), and the
  * extractor works ONLY from the html column with RE2-safe regexes
  * shared verbatim by the SQL oracle (`<[^>]*>` tag strip,
  * `<a [^>]*>([^<]*)</a>` anchor-text capture, literal-alternation
  * block split — no lookaround, so Java regex and RE2 agree).
  *
  * Like the WAV/AVI/PNG/tar family, generation is deterministic from
  * the documents table (block i is a link-farm iff
  * md5("blk:id:i") ≡ 0 mod 3), so the whole generate→extract
  * round-trip is oracle-checkable end to end.
  *
  * Scale shape: generation and per-block scoring are map-only
  * expressions on the scan; the only shuffle is the per-doc
  * reassembly groupBy (keyed on doc id, map-side combined). Block
  * state is bounded by the document, the documented bounded case —
  * docs scale out, blocks don't.
  */
object Html {

  private val blockWords = 10

  /** Deterministic HTML wrap of `textCol`: nav div, then the text's
    * words in [[blockWords]]-word blocks — paragraph or link-farm
    * menu per an md5 draw — inside `<body>`. Adds column `html`. */
  def htmlFromDocs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__w", expr(s"split(trim($textCol), '\\\\s+')"))
      .withColumn("html", expr(
        s"""concat(
           | '<body><div class="nav"><a href="/">home</a> <a href="/a">about</a></div>',
           | array_join(transform(sequence(0, CAST(ceil(size(__w) / ${blockWords}.0) AS INT) - 1),
           |   i -> CASE WHEN CAST(conv(substring(md5(concat('blk:', CAST($idCol AS STRING), ':', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 3 = 0
           |     THEN concat('<div class="m">',
           |       array_join(transform(slice(__w, i * $blockWords + 1, $blockWords),
           |         w -> concat('<a href="#', w, '">', w, '</a>')), ''),
           |       '</div>')
           |     ELSE concat('<p>',
           |       array_join(slice(__w, i * $blockWords + 1, $blockWords), ' '),
           |       '</p>') END), ''),
           | '</body>')""".stripMargin))
      .drop("__w")

  /** Block-level link-density extraction from the `html` column ONLY:
    * split on closing tags, strip markup for the visible text, score
    * `anchor chars / visible chars`, keep blocks at density ≤ 0.5,
    * reassemble the main text in document order. Returns per doc:
    * block counts, kept/total visible chars, the main text's md5 and
    * the boilerplate char fraction. */
  def extractMain(dfWithHtml: DataFrame, idCol: String): DataFrame = {
    val pieces = dfWithHtml
      .select(col(idCol), posexplode(split(col("html"), "</p>|</div>"))
        .as(Seq("pos", "raw")))
      .withColumn("vis", regexp_replace(col("raw"), "<[^>]*>", ""))
      .filter(length(col("vis")) > 0)
      .withColumn("link_chars", expr(
        "aggregate(regexp_extract_all(raw, '<a [^>]*>([^<]*)</a>', 1), 0, (a, x) -> a + length(x))"))
      .withColumn("keep",
        col("link_chars").cast("double") / length(col("vis")).cast("double")
          <= lit(0.5))
    pieces.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), length(col("vis")).cast("long"))
          .otherwise(0L)).as("kept_chars"),
        sum(length(col("vis")).cast("long")).as("total_chars"),
        md5(array_join(transform(array_sort(
            collect_list(when(col("keep"), struct(col("pos"), col("vis"))))),
          s => s.getField("vis")), " ")).as("main_md5"))
      .withColumn("boiler_frac", MysqlFunctions.oracleRound(
        lit(1.0) - col("kept_chars").cast("double") /
          col("total_chars").cast("double"), 6))
  }
}
