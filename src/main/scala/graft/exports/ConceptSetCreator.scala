package graft.exports

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sink.CsvSink

/** The util concept-set CSV derivation (R6/O6,
  * `util/src/concept_set_csv_creator.py:40-77`): given a concepts-domain
  * CSV whose FIRST row defines the set, emit one member row per
  * remaining input row — `Concept` = the set's uuid, `Member` = the
  * row's uuid, `Member Type` = CONCEPT-SET, `Sort Weight` = 1..N in
  * input order, `Void/Retire` passed through, plus `#`-prefixed copies
  * of every `Fully specified name:<locale>` column.
  *
  * Row order IS the contract here, so the input must carry an explicit
  * order column; [[fromCsv]] derives one from single-file CSV read
  * order (the util's own assumption about its input).
  */
object ConceptSetCreator {

  /** Attach `__idx` preserving the file's row order (single-file CSV —
    * the util's input contract; order is not meaningful on multi-file
    * input). */
  def fromCsv(df: DataFrame): DataFrame = {
    // pin the file-order id in its own column BEFORE the window so the
    // ordering key is assigned on the coalesced single partition; the
    // constant partition key then silences the WindowExec warning
    // without changing the (single-file, provably tiny) frame
    val w = Window.partitionBy(lit(0)).orderBy("__mid")
    df.coalesce(1).withColumn("__mid", monotonically_increasing_id())
      .withColumn("__idx", row_number().over(w)).drop("__mid")
  }

  /** Derive the set CSV rows from an indexed concepts DataFrame
    * (`__idx` 1-based input order; row 1 = the set). */
  def derive(indexed: DataFrame): DataFrame = {
    val nameCols = indexed.columns.filter(_.contains("Fully specified name:"))
    val setUuid = indexed.filter(col("__idx") === 1)
      .select("uuid").head().getString(0)
    val members = indexed.filter(col("__idx") > 1)
    members.select(
      Seq(lit(setUuid).as("Concept"),
        col("uuid").as("Member")) ++
      nameCols.map(n => col(n).as(s"#$n")) ++
      Seq(lit("CONCEPT-SET").as("Member Type"),
        (col("__idx") - 1).as("Sort Weight"),
        col("Void/Retire"),
        col("__idx")): _*)
  }

  def columns(df: DataFrame): Seq[String] = {
    val names = df.columns.filter(_.startsWith("#Fully specified name:")).toSeq
    Seq("Concept", "Member") ++ names ++
      Seq("Member Type", "Sort Weight", "Void/Retire")
  }

  /** CSV → CSV end-to-end (the util's whole surface). */
  def export(input: DataFrame, outPath: String): Unit = {
    val rows = derive(fromCsv(input))
    CsvSink.write(rows, columns(rows), Seq(col("__idx")), outPath)
  }
}
