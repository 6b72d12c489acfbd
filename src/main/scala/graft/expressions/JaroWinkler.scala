package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity over UTF-8 BYTES — the
  * entity-resolution scorer (record-linkage classic; the tight inner
  * loop of every blocked fuzzy-match pass). Spark ships levenshtein
  * but no Jaro family; a UDF would leave the hottest pair loop
  * interpreted, so this is the custom-Expression case of SURVEY §7.3.
  *
  * Semantics pinned to the SQL-oracle engine's function of the same
  * name (probed empirically, `StatsWaveSpec`): byte-level comparison
  * (not codepoints), match window `max(max(la,lb)/2 - 1, 0)`,
  * transpositions = half the out-of-order matches, Winkler prefix
  * bonus `jaro + l·0.1·(1−jaro)` with prefix cap 4 applied only when
  * jaro > 0.7, and 0.0 when either input is empty. Byte-level keeps
  * the scorer allocation-free on UTF8String (no decode); for ASCII
  * keys — the blocking-key case — bytes and codepoints coincide.
  *
  * O(la·lb) worst case per pair: always run it AFTER blocking, never
  * on a raw cross join (q250 blocks on (brand, size) and ranks within
  * brand).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  private val BoostThreshold = 0.7
  private val PrefixCap = 4
  private val PrefixScale = 0.1

  /** Jaro–Winkler over the UTF-8 bytes of the two strings. Public +
    * static-shaped so generated code can call it. */
  def similarity(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.getBytes
    val b = sb.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched bytes compared in match order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t / 2).toDouble / m) / 3.0
    if (jaro <= BoostThreshold) return jaro
    var l = 0
    val maxL = math.min(PrefixCap, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * PrefixScale * (1.0 - jaro)
  }
}
