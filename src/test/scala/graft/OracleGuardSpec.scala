package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the DuckDB-oracle integer-overflow-type class
  * that shipped red three rounds running (q70 r4, q83 r5): DuckDB
  * `sum(<integer>)` returns HUGEINT, which the driver's pandas compare
  * converts to float64 while Spark emits int64 — rows/schema green,
  * hash red. The recurring syntactic shape is
  * `sum(CAST(... AS BIGINT))` with no OUTER cast.
  *
  * The lint flags every `sum(` whose balanced argument is a
  * CAST-to-integer unless the sum itself sits inside a `CAST(`/
  * `round(` wrapper chain (e.g. `CAST(coalesce(sum(...)))` counts —
  * the wrapper re-types the result before it reaches output). The
  * companion type-strict compare lives in tools/check.py (dtype-family
  * check), which catches the flow-through variants (`sum(int_cte_col)`)
  * a lexical lint cannot type.
  */
object OracleGuard {
  private val intCastArg =
    "(?is)^\\s*cast\\s*\\(.*\\bas\\s+(?:big|huge|small|tiny|u)?int(?:eger)?\\s*\\)\\s*$".r
  private val wrapperNames = Set("cast", "round", "trunc", "floor", "ceil")

  /** Offsets of `sum(` occurrences violating the rule. */
  def violations(sql: String): Seq[Int] = {
    val lower = sql.toLowerCase
    val hits = scala.collection.mutable.ArrayBuffer[Int]()
    var i = lower.indexOf("sum")
    while (i >= 0) {
      val boundary = i == 0 || !(lower(i - 1).isLetterOrDigit || lower(i - 1) == '_')
      val j = lower.indexWhere(!_.isWhitespace, i + 3)
      if (boundary && j >= 0 && lower(j) == '(') {
        // balanced argument of this sum(
        var depth = 1; var k = j + 1
        while (k < lower.length && depth > 0) {
          if (lower(k) == '(') depth += 1
          else if (lower(k) == ')') depth -= 1
          k += 1
        }
        val arg = sql.substring(j + 1, math.max(j + 1, k - 1))
        if (intCastArg.matches(arg) && !wrappedInCastOrRound(lower, i))
          hits += i
      }
      i = lower.indexOf("sum", i + 3)
    }
    hits.toSeq
  }

  /** Walk the chain of immediately-enclosing `name(` calls before
    * position `pos`; true if any is a re-typing wrapper. */
  private def wrappedInCastOrRound(lower: String, pos: Int): Boolean = {
    var end = pos
    var found = false
    var more = true
    while (more && !found) {
      while (end > 0 && lower(end - 1).isWhitespace) end -= 1
      if (end > 0 && lower(end - 1) == '(') {
        var s = end - 1
        while (s > 0 && (lower(s - 1).isLetterOrDigit || lower(s - 1) == '_')) s -= 1
        val name = lower.substring(s, end - 1)
        if (name.isEmpty) more = false
        else { found = wrapperNames(name); end = s }
      } else more = false
    }
    found
  }
}

class OracleGuardSpec extends AnyFunSuite {

  test("lint catches the exact r5 q83 bug text") {
    val brokenR5 =
      """WITH tok AS (
        | SELECT source AS domain,
        |  sum(CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT))
        |   AS n_tokens
        | FROM documents GROUP BY 1)
        |SELECT domain, n_tokens FROM tok""".stripMargin
    assert(OracleGuard.violations(brokenR5).nonEmpty)
  }

  test("lint accepts the wrapped forms") {
    assert(OracleGuard.violations(
      "SELECT CAST(sum(CAST(x AS BIGINT)) AS BIGINT) AS n FROM t").isEmpty)
    assert(OracleGuard.violations(
      "SELECT CAST(coalesce(sum(CAST(x AS BIGINT)), 0) AS BIGINT) AS n FROM t").isEmpty)
    assert(OracleGuard.violations(
      "SELECT round(sum(price), 2) AS r FROM t").isEmpty)
    // double sums are not the HUGEINT class
    assert(OracleGuard.violations(
      "SELECT sum(v * w) AS s FROM t GROUP BY g").isEmpty)
    // list_sum is not an aggregate sum
    assert(OracleGuard.violations(
      "SELECT list_sum(CAST(x AS BIGINT)) FROM t").isEmpty)
  }

  test("no oracle ships a bare integer-cast sum (the q70/q83 class)") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val v = OracleGuard.violations(sql)
        if (v.isEmpty) Nil
        else Seq(s"$name at offsets ${v.mkString(",")}: wrap the sum in " +
          "CAST(... AS BIGINT) — DuckDB sum(<integer>) returns HUGEINT " +
          "(float64 through the driver compare) vs Spark int64")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
