package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lempel-Ziv 1976 phrase complexity of the first `maxChars`
  * characters of a string — the number of phrases in the exhaustive
  * production parse (Lempel & Ziv, IEEE-IT '76; the Kaspar-Schuster
  * '87 counting algorithm): scanning left to right, each phrase is the
  * SHORTEST prefix of the remaining suffix that does not occur as a
  * substring of everything before its last character (so the copy
  * source may overlap the phrase itself — the LZ76 self-referential
  * rule); the final phrase may be reproducible and still counts.
  *
  * Why native: the parse is inherently sequential per document (each
  * phrase boundary depends on the previous one), which no composition
  * of built-in functions expresses without an O(n²) position×length
  * explode PER DOC through a shuffle. As an expression it is one
  * codegen'd per-row call on the scan — map-only at any corpus size,
  * the same contract as the quality-signal family it joins (q249
  * trigram compressibility, q337 entropy rate, q413 Huffman): LZ
  * complexity is the classic "is this text structured or word salad /
  * binary noise?" signal, low for templated spam and high for fluent
  * prose of the same length.
  *
  * Character (not byte) semantics, matching SQL `substr`/`strpos`:
  * positions count code points. The corpus is BMP-only, so the
  * UTF-16 walk below equals code-point indexing; an astral char would
  * shift both engines identically only if surrogate pairs were
  * handled — guarded by falling back to code-point extraction when
  * the prefix contains surrogates.
  *
  * Complexity cost: worst-case O(n³) char compares with n = maxChars
  * — a CONSTANT per row (the operator contract caps n; q451 uses 120),
  * ~1.7M compares worst-case, microseconds on a modern core.
  */
case class LzComplexity(child: Expression, maxChars: Int)
    extends UnaryExpression {
  require(maxChars > 0, "maxChars must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lz76 requires a string input, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lz76"

  override def nullSafeEval(input: Any): Any =
    LzComplexity.complexity(input.asInstanceOf[UTF8String], maxChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.LzComplexity.complexity($c, $maxChars);")

  override protected def withNewChildInternal(newChild: Expression): LzComplexity =
    copy(child = newChild)
}

object LzComplexity {

  /** Number of LZ76 phrases of the first `maxChars` characters.
    * Public + static-shaped so generated code can call it. */
  def complexity(t: UTF8String, maxChars: Int): Int = {
    // SQL-substr semantics: first maxChars CHARACTERS
    val s = t.substringSQL(1, maxChars).toString
    val n = s.length
    if (n == 0) return 0
    // BMP guard: if the prefix contains surrogate pairs, re-extract by
    // code points so positions match SQL exactly
    val cs: Array[Int] =
      if (s.codePointCount(0, n) == n) {
        val a = new Array[Int](n); var i = 0
        while (i < n) { a(i) = s.charAt(i); i += 1 }
        a
      } else s.codePoints().toArray
    lz76(cs)
  }

  /** occurs(pos, l): does cs[pos..pos+l-1] occur starting at some
    * st <= pos-1 (the copy window is everything before the phrase's
    * last char, so the source may overlap the phrase)? */
  private def occurs(cs: Array[Int], pos: Int, l: Int): Boolean = {
    var st = 0
    while (st < pos) {
      var j = 0
      while (j < l && cs(st + j) == cs(pos + j)) j += 1
      if (j == l) return true
      st += 1
    }
    false
  }

  private def lz76(cs: Array[Int]): Int = {
    val n = cs.length
    var pos = 0
    var c = 0
    while (pos < n) {
      // smallest l with no earlier occurrence; if every prefix of the
      // remaining suffix reproduces, the final phrase is the suffix
      var l = 1
      while (pos + l <= n && occurs(cs, pos, l)) l += 1
      val flen = if (pos + l <= n) l else n - pos
      pos += flen
      c += 1
    }
    c
  }
}
