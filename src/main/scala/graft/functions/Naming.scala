package graft.functions

/** Identifier/filename hygiene utilities (P7/P8).
  *
  * `nameTransform` mirrors the reference's SQL-alias mangling
  * (`concepts/src/concept_csv_export.py:289-290`): `- . | space` → `_`
  * so config-driven fragments are safe in generated identifiers.
  * `squishName` mirrors the output-filename mangling (`:594-596`):
  * spaces → dashes.
  */
object Naming {
  def nameTransform(s: String): String =
    s.replace("-", "_").replace(" ", "_").replace(".", "_").replace("|", "_")

  def squishName(s: String): String = s.replace(" ", "-")
}
