package graft

import org.apache.spark.sql.DataFrame

/** OpenMRS-shaped fixture tables (FIXTURES.md §2/§3) with the edge
  * cases the reference's semantics hinge on: a retired concept, a
  * retired member, a voided name, multi-locale names, numeric/complex
  * concepts, PIH Number/Name mapping split, a concept missing the key
  * mapping, an all-empty column, attribute values containing ':'. */
object ExportFixtures {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // concept 6 is retired; 1 is a set; 7 is complex with no mappings
  lazy val concept: DataFrame = Seq(
    (1L, "uuid-1", 10L, 20L, 0, 1),
    (2L, "uuid-2", 11L, 21L, 0, 0),
    (3L, "uuid-3", 11L, 22L, 0, 0),
    (4L, "uuid-4", 11L, 22L, 0, 0),
    (5L, "uuid-5", 11L, 22L, 0, 0),
    (6L, "uuid-6", 11L, 22L, 1, 0),
    (7L, "uuid-7", 11L, 23L, 0, 0))
    .toDF("concept_id", "uuid", "class_id", "datatype_id", "retired", "is_set")

  lazy val conceptClass: DataFrame = Seq(
    (10L, "ConvSet"), (11L, "Misc"))
    .toDF("concept_class_id", "name")

  lazy val conceptDatatype: DataFrame = Seq(
    (20L, "N/A"), (21L, "Numeric"), (22L, "Coded"), (23L, "Complex"))
    .toDF("concept_datatype_id", "name")

  // voided FSN for 4 alongside the live one; es names only for 2;
  // SHORT only for 2 (en) => "Short name:es" is all-empty (R4 pruning)
  lazy val conceptName: DataFrame = Seq(
    (1L, "Vital signs", "en", "FULLY_SPECIFIED", 0),
    (2L, "Weight", "en", "FULLY_SPECIFIED", 0),
    (2L, "Wt", "en", "SHORT", 0),
    (2L, "Peso", "es", "FULLY_SPECIFIED", 0),
    (3L, "Temperature", "en", "FULLY_SPECIFIED", 0),
    (4L, "Yes", "en", "FULLY_SPECIFIED", 0),
    (4L, "OldYes", "en", "FULLY_SPECIFIED", 1),
    (5L, "No", "en", "FULLY_SPECIFIED", 0),
    (6L, "Retired concept", "en", "FULLY_SPECIFIED", 0),
    (7L, "Scan image", "en", "FULLY_SPECIFIED", 0))
    .toDF("concept_id", "name", "locale", "concept_name_type", "voided")

  // \r\n exercised (P5 strip)
  lazy val conceptDescription: DataFrame = Seq(
    (2L, "Patient weight\r\nin kg", "en"),
    (3L, "Body temperature", "en"),
    (3L, "Temperatura corporal", "es"))
    .toDF("concept_id", "description", "locale")

  lazy val conceptMapType: DataFrame = Seq(
    (30L, "SAME-AS"), (31L, "NARROWER-THAN"))
    .toDF("concept_map_type_id", "name")

  lazy val conceptReferenceSource: DataFrame = Seq(
    (40L, "CIEL"), (41L, "PIH"))
    .toDF("concept_source_id", "name")

  // term 54 is retired (must be filtered); 52 numeric PIH -> PIH|Number,
  // 53 named PIH -> PIH|Name
  lazy val conceptReferenceTerm: DataFrame = Seq(
    (50L, "1114", 40L, 0),
    (51L, "5089", 40L, 0),
    (52L, "5089", 41L, 0),
    (53L, "TEMPERATURE", 41L, 0),
    (54L, "9999", 40L, 1),
    (55L, "124", 40L, 0),
    (56L, "1065", 40L, 0),
    (57L, "1066", 40L, 0))
    .toDF("concept_reference_term_id", "code", "concept_source_id", "retired")

  lazy val conceptReferenceMap: DataFrame = Seq(
    (1L, 30L, 50L),  // 1 SAME-AS CIEL 1114
    (2L, 30L, 51L),  // 2 SAME-AS CIEL 5089
    (2L, 30L, 52L),  // 2 SAME-AS PIH 5089 (Number)
    (3L, 30L, 53L),  // 3 SAME-AS PIH TEMPERATURE (Name)
    (3L, 31L, 55L),  // 3 NARROWER-THAN CIEL 124
    (4L, 30L, 54L),  // retired term -> dropped
    (4L, 30L, 56L),  // 4 SAME-AS CIEL 1065
    (5L, 30L, 57L))  // 5 SAME-AS CIEL 1066
    .toDF("concept_id", "concept_map_type_id", "concept_reference_term_id")

  lazy val conceptNumeric: DataFrame = Seq(
    (2L, Some(300.0), None: Option[Double], Some(250.0), Some(0.0),
      None: Option[Double], Some(1.0), Some("kg"), Some(1), Some(1)))
    .toDF("concept_id", "hi_absolute", "hi_critical", "hi_normal",
      "low_absolute", "low_critical", "low_normal", "units",
      "display_precision", "allow_decimal")

  lazy val conceptComplex: DataFrame = Seq(
    (7L, "ImageHandler")).toDF("concept_id", "handler")

  // set 1 members: 3 (weight 1.0) before 2 (weight 2.0); retired 6 dropped
  lazy val conceptSet: DataFrame = Seq(
    (1L, 2L, 2.0), (1L, 3L, 1.0), (1L, 6L, 3.0))
    .toDF("concept_set", "concept_id", "sort_weight")

  // 3 answers: 4 Yes (1.0) before 5 No (2.0)
  lazy val conceptAnswer: DataFrame = Seq(
    (3L, 4L, 1.0), (3L, 5L, 2.0))
    .toDF("concept_id", "answer_concept", "sort_weight")

  lazy val conceptTables: Map[String, DataFrame] = Map(
    "concept" -> concept,
    "concept_class" -> conceptClass,
    "concept_datatype" -> conceptDatatype,
    "concept_name" -> conceptName,
    "concept_description" -> conceptDescription,
    "concept_map_type" -> conceptMapType,
    "concept_reference_source" -> conceptReferenceSource,
    "concept_reference_term" -> conceptReferenceTerm,
    "concept_reference_map" -> conceptReferenceMap,
    "concept_numeric" -> conceptNumeric,
    "concept_complex" -> conceptComplex,
    "concept_set" -> conceptSet,
    "concept_answer" -> conceptAnswer)

  def conceptResolver: String => DataFrame = conceptTables(_)

  // ---- locations (FIXTURES.md §3): root, children, retired, ':' value,
  // child id below parent id (4 -> parent 5) ----
  lazy val locationTables: Map[String, DataFrame] = Map(
    "location" -> Seq(
      (1L, "loc-1", "Root Hospital", Some("The root"), None: Option[Long], 0),
      (2L, "loc-2", "Clinic A", Some("Ward A"), Some(1L), 0),
      (3L, "loc-3", "Clinic B", None: Option[String], Some(1L), 1),
      (4L, "loc-4", "Annex", None: Option[String], Some(5L), 0),
      (5L, "loc-5", "Campus", None: Option[String], None: Option[Long], 0))
      .toDF("location_id", "uuid", "name", "description", "parent_location", "retired"),
    "location_tag_map" -> Seq(
      (1L, 60L), (2L, 61L), (2L, 62L))
      .toDF("location_id", "location_tag_id"),
    "location_tag" -> Seq(
      (60L, "Facility"), (61L, "Login Location"), (62L, "Admission Location"))
      .toDF("location_tag_id", "name"),
    "location_attribute" -> Seq(
      (1L, 70L, "RT"), (2L, 70L, "CA:01"))  // ':' inside a value
      .toDF("location_id", "attribute_type_id", "value_reference"),
    "location_attribute_type" -> Seq(
      (70L, "Code")).toDF("location_attribute_type_id", "name"))

  def locationResolver: String => DataFrame = locationTables(_)

  lazy val orderTypeTables: Map[String, DataFrame] = Map(
    "order_type" -> Seq(
      (1L, "ot-1", "Drug Order", Some("Drugs"), "org.openmrs.DrugOrder",
        None: Option[Long], 0),
      (2L, "ot-2", "Test Order", None: Option[String], "org.openmrs.TestOrder",
        Some(1L), 0))
      .toDF("order_type_id", "uuid", "name", "description", "java_class_name",
        "parent", "retired"))

  def orderTypeResolver: String => DataFrame = orderTypeTables(_)
}
