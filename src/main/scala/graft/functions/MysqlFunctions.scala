package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalar/aggregate helpers reproducing the MySQL semantics the reference
  * relies on, expressed as codegen-friendly compositions of built-in
  * `org.apache.spark.sql.functions` (no UDFs — stays inside
  * whole-stage codegen).
  */
object MysqlFunctions {

  /** MySQL `CAST(expr AS UNSIGNED)`: parses the leading decimal-digit
    * prefix of the string, yielding 0 (not NULL) when there is none.
    * The reference uses this to split PIH codes into "Number" vs "Name"
    * sources (`concepts/src/concept_csv_export.py:299-306`). Spark's own
    * `cast` yields null for non-numeric strings, hence the
    * regexp-extract + coalesce wrapper. `regexp_extract` yields `""` (not
    * null) on no-match, and Spark 4 ANSI mode throws CAST_INVALID_INPUT
    * casting `""` to a numeric — hence the `nullif` guard.
    */
  def castUnsigned(c: Column): Column =
    coalesce(nullif(regexp_extract(c, "^\\s*([0-9]+)", 1), lit("")).cast(LongType),
      lit(0L))

  /** Oracle-parity double rounding, pinned in ONE place (every rounded
    * double in a query must use this). DuckDB rounds a DOUBLE as
    * `floor(x * 10^s + 0.5) / 10^s` (half away from zero, computed in
    * double arithmetic — verified empirically; e.g. 50863.854999999996
    * rounds to 50863.86 because 50863.854999999996 * 100 lands exactly on
    * 5086385.5). Spark's `round`/`bround` convert through BigDecimal and
    * disagree on exactly those boundary products, so we reproduce the
    * same double-arithmetic formula as a codegen'd expression. */
  def oracleRound(c: Column, scale: Int): Column = {
    val p = lit(math.pow(10, scale))
    when(c < 0, -floor(-c * p + lit(0.5)) / p)
      .otherwise(floor(c * p + lit(0.5)) / p)
  }

  /** `REPLACE(REPLACE(x,'\r',''),'\n','')` — newline strip applied to
    * descriptions before CSV write (`concept_csv_export.py:318`). */
  def stripNewlines(c: Column): Column =
    regexp_replace(c, "[\\r\\n]", "")

  /** MySQL `GROUP_CONCAT(DISTINCT name ORDER BY weight SEPARATOR sep)`.
    *
    * MySQL's semantics when duplicate names disagree on weight are
    * implementation-defined; we pin them deterministically (SURVEY §7.4.1):
    * each distinct name is ordered by its minimum weight (ties broken by
    * name), then joined. Used for `Members`/`Answers`
    * (`concept_csv_export.py:348-349`).
    *
    * Implementation: one aggregation pass —
    * `collect_list(struct(w,n))` → `array_sort` (by w, then n) →
    * `transform(_.n)` → `array_distinct` (keeps FIRST occurrence, i.e.
    * min weight) → `array_join`. All built-in higher-order functions;
    * no custom Aggregator needed, and the map-side partial aggregation
    * of collect_list keeps the shuffle proportional to group fan-in.
    * Null names are dropped (matches GROUP_CONCAT, which skips NULLs).
    */
  def orderedDistinctConcat(name: Column, weight: Column, sep: String): Column = {
    val pairs = collect_list(
      when(name.isNotNull, struct(weight.as("w"), name.as("n"))))
    array_join(array_distinct(transform(array_sort(pairs), _.getField("n"))), sep)
  }

  /** Ordered-distinct collect as an array (internal representation —
    * SURVEY §1.4 keeps list cells as ArrayType until the CSV boundary). */
  def orderedDistinctList(name: Column, weight: Column): Column = {
    val pairs = collect_list(
      when(name.isNotNull, struct(weight.as("w"), name.as("n"))))
    array_distinct(transform(array_sort(pairs), _.getField("n")))
  }

  /** MySQL `group_concat(DISTINCT x)` without ORDER BY (tags/attributes,
    * `locations/src/location_csv_export.py:113-114`). MySQL order is
    * nondeterministic; we pin it to sorted-by-value. */
  def sortedDistinctConcat(c: Column, sep: String): Column =
    array_join(array_sort(collect_set(c)), sep)
}
