package graft.config

/** Configuration for the concepts export, mirroring the reference's CLI
  * surface and globals (`concepts/src/concept_csv_export.py:22-67,641-760`):
  * locales, name types, mapping types, concept sources (with the
  * `PIH|Name` / `PIH|Number` cast-split convention), OpenMRS version
  * gates, optional key-mapping source, tree root, and exclude lists.
  */
final case class ConceptsConfig(
    locales: Seq[String] = Seq("en"),
    nameTypes: Seq[String] = Seq("full", "short"),
    mappingTypes: Seq[String] = ConceptsConfig.defaultMappingTypes,
    conceptSources: Seq[String] = ConceptsConfig.defaultConceptSources,
    version: String = "2.3",
    conceptKeyMapping: Option[String] = None,
    setName: Option[String] = None,
    limit: Option[Int] = None) {

  require(locales.nonEmpty, "at least one locale required")
  // --key-mapping reads the `Mappings|SAME-AS|<src>` pivot column; fail
  // up front (not with an unresolved-column error mid-plan) when the
  // configured mapping types / sources cannot produce it
  conceptKeyMapping.foreach { src =>
    require(mappingTypes.contains("SAME-AS"),
      s"--key-mapping $src requires mapping type SAME-AS " +
        s"(got: ${mappingTypes.mkString(", ")})")
    require(conceptSources.contains(src),
      s"--key-mapping $src requires '$src' in the concept sources " +
        s"(got: ${conceptSources.mkString(", ")})")
  }
  def defaultLocale: String = locales.head

  /** Key column used by tree-filter / cycle / reorder / exclude
    * (`concept_csv_export.py:599-604`). */
  def key: String = conceptKeyMapping
    .map("_mapping:" + _)
    .getOrElse("Fully specified name:" + defaultLocale)

  // Version gates (`concept_csv_export.py:333-346`)
  private def versionAtLeast(v: String): Boolean = {
    def parts(s: String) = s.split("\\.").map(p =>
      p.takeWhile(_.isDigit)).map(p => if (p.isEmpty) 0 else p.toInt).toSeq
    val (a, b) = (parts(version), parts(v))
    val len = math.max(a.length, b.length)
    val ap = a.padTo(len, 0); val bp = b.padTo(len, 0)
    !ap.zip(bp).exists { case (x, y) => x != y } ||
      ap.zip(bp).find { case (x, y) => x != y }.forall { case (x, y) => x > y }
  }
  def hasPrecisionColumns: Boolean = versionAtLeast("1.11")
  def allowDecimalColumn: String =
    if (versionAtLeast("2.2")) "allow_decimal" else "precise"

  /** Iniz header fragment per name type (`concept_csv_export.py:67`). */
  def inizNameType(nt: String): String = nt match {
    case "full" => "Fully specified name"
    case "short" => "Short name"
    case other => other
  }

  /** Name column headers, locale-major (`concept_csv_export.py:632-637`). */
  def nameColumnHeaders: Seq[String] =
    for (l <- locales; nt <- nameTypes) yield s"${inizNameType(nt)}:$l"

  /** Mapping column headers in reference SELECT order — source-major
    * (`concept_csv_export.py:320-321`). */
  def mappingColumnHeaders: Seq[String] =
    for (cs <- conceptSources; t <- mappingTypes) yield s"Mappings|$t|$cs"
}

object ConceptsConfig {
  /** `concept_csv_export.py:31-38` */
  val defaultMappingTypes: Seq[String] =
    Seq("SAME-AS", "NARROWER-THAN", "BROADER-THAN")

  /** `concept_csv_export.py:40-56` */
  val defaultConceptSources: Seq[String] = Seq(
    "PIH|Name", "PIH|Number", "CIEL", "AMPATH", "ICD-10-WHO",
    "ICD-10-WHO 2nd", "ICD-11-WHO", "Liberia MoH", "LOINC",
    "org.openmrs.module.emrapi", "PIH Malawi", "RxNORM", "SES Lab",
    "SNOMED CT", "SNOMED UK")
}
