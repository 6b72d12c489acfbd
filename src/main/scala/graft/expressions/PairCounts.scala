package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, IntegerType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-character-pair counts as a native expression: one tight
  * char walk per row returning the row's `{pair -> count}` map
  * (overlapping positions counted, the BPE convention).
  *
  * This is the hot inner loop of BPE vocabulary learning
  * ([[graft.operators.TextCorpus.bpeFit]], q160/q164/q176): the
  * built-in composition — `explode(transform(sequence(1, len-1),
  * i -> substring(t, i, 2)))` — evaluates an interpreted lambda per
  * CHARACTER and allocates a 2-char UTF8String per position, then
  * feeds |corpus| rows into the pair aggregate. The native walk stays
  * inside whole-stage codegen, allocates one small map per DOCUMENT,
  * and pre-aggregates repeats row-side, so the downstream exploded
  * aggregate sees ~distinct-pairs-per-doc rows instead of
  * ~chars-per-doc (measured r9: the 6-round fit's pair scans dominated
  * q160's 12.9 s; see the bench table committed with this change).
  *
  * CONTRACT: pairs are JAVA-CHAR (UTF-16 code unit) adjacencies —
  * identical to code-point adjacency on BMP-only text, which the
  * corpus contract guarantees (ASCII + U+E000.. merge symbols). A
  * supplementary-plane character would split into surrogates here but
  * into code points in the SQL-oracle restatement; keep such text out
  * of the BPE family (the spec pins the BMP behavior).
  */
case class PairCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pair_counts requires a string input, got $t")
  }
  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "graft_pair_counts"

  override def nullSafeEval(input: Any): Any =
    PairCounts.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PairCounts.count($c);")

  override protected def withNewChildInternal(newChild: Expression): PairCounts =
    copy(child = newChild)
}

object PairCounts {
  /** First-seen key order — deterministic for a given string, and
    * irrelevant downstream (the consumer aggregates across rows). */
  def count(s: UTF8String): MapData = {
    val str = s.toString
    val n = str.length
    val m = new java.util.LinkedHashMap[String, Int]()
    var i = 0
    while (i < n - 1) {
      val p = str.substring(i, i + 2)
      m.put(p, m.getOrDefault(p, 0) + 1)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
