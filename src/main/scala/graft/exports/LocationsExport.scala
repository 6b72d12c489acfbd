package graft.exports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{MysqlFunctions => M}
import graft.sink.CsvSink

/** Locations export (`locations/src/location_csv_export.py:105-230` and
  * the static `sql/locations.sql`): location rows with parent lookup,
  * tags spread to `Tag|<name>` = TRUE columns (R1) and attributes to
  * `Attribute|<name>` = value columns (R2), fixed leading columns plus
  * sorted dynamic columns (R3).
  *
  * Spark-first shape: instead of group_concat-ing tags/attributes into
  * delimited strings and re-splitting them client-side (which breaks on
  * values containing ':' — the reference bug at
  * `location_csv_export.py:150-152`), each spread is its own pivot
  * joined back on `location_id`. Attribute values survive any
  * character. Tag/attribute name sets are data-dependent, so the pivots
  * run a discovery pass — inherent to the dynamic schema (SURVEY §7.3).
  */
object LocationsExport {

  /** One row per location: UUID, Void/Retire, Name, Description,
    * Parent (name), plus the dynamic `Tag|x` / `Attribute|x` columns. */
  def pipeline(t: String => DataFrame): DataFrame = {
    val base = t("location").as("l")
      .join(t("location").as("p"),
        col("l.parent_location") === col("p.location_id"), "left")
      .select(col("l.location_id").as("location_id"),
        col("l.uuid").as("UUID"),
        col("l.retired").as("Void/Retire"),
        col("l.name").as("Name"),
        col("l.description").as("Description"),
        col("p.name").as("Parent"))

    val tags = t("location_tag_map").as("ltm")
      .join(broadcast(t("location_tag").as("lt")),
        col("ltm.location_tag_id") === col("lt.location_tag_id"))
      .select(col("ltm.location_id").as("location_id"),
        concat(lit("Tag|"), col("lt.name")).as("__hdr"))
      .groupBy("location_id").pivot("__hdr").agg(first(lit("TRUE")))

    val attrs = t("location_attribute").as("la")
      .join(broadcast(t("location_attribute_type").as("lat")),
        col("la.attribute_type_id") === col("lat.location_attribute_type_id"))
      .select(col("la.location_id").as("location_id"),
        concat(lit("Attribute|"), col("lat.name")).as("__hdr"),
        col("la.value_reference").as("__val"))
      // min, not first: a location with multiple rows for one attribute
      // type must pivot deterministically (MySQL's group_concat-then-
      // split is effectively last-wins; this project pins every such
      // choice — same convention as sortedDistinctConcat)
      .groupBy("location_id").pivot("__hdr").agg(min(col("__val")))

    base
      .join(tags, Seq("location_id"), "left")
      .join(attrs, Seq("location_id"), "left")
  }

  /** R3 column order: fixed prefix + sorted attributes + sorted tags
    * (`location_csv_export.py:219-230`). */
  def orderedColumns(df: DataFrame): Seq[String] = {
    val fixed = Seq("UUID", "Void/Retire", "Name", "Description", "Parent")
    val attrs = df.columns.filter(_.startsWith("Attribute|")).sorted
    val tags = df.columns.filter(_.startsWith("Tag|")).sorted
    fixed ++ attrs ++ tags
  }

  def export(t: String => DataFrame, outPath: String): Unit = {
    val rows = pipeline(t)
    CsvSink.write(rows, orderedColumns(rows), Seq(col("location_id")), outPath)
  }

  /** The static `sql/locations.sql` variant: parent referenced by UUID,
    * no tags/attributes, ordered by location_id. */
  def simple(t: String => DataFrame): DataFrame =
    t("location").as("l")
      .join(t("location").as("p"),
        col("l.parent_location") === col("p.location_id"), "left")
      .select(col("l.location_id").as("location_id"),
        col("l.uuid").as("Uuid"),
        col("l.retired").as("Void/Retire"),
        col("l.name").as("Name"),
        col("l.description").as("Description"),
        col("p.uuid").as("Parent"))
}
