package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]] — the engine's first custom mergeable aggregate (the
  * SURVEY §7.3 "custom TypedColumn for agg functions" layer; the
  * composition layer can't express "k smallest DISTINCT per group"
  * without a per-group sort of ALL values, and `approx_count_distinct`
  * can't take the md5-closed-form hashes an oracle can restate).
  *
  * State is a sorted ascending array of ≤ k distinct hash values —
  * bounded regardless of group size, the property that makes the same
  * aggregate safe under STREAMING windowed aggregation (state per open
  * window = k longs; contrast the exact `collect_set` whose state is
  * the group's full distinct set). `reduce` is a binary-search insert
  * that drops values ≥ the current k-th min; `merge` is the associative
  * k-set union (Agarwal et al. PODS'12 mergeable summaries — partial
  * map-side sketches combine losslessly, so this distributes like any
  * built-in agg). `finish` applies the Beyer et al. SIGMOD'07 unbiased
  * estimator (k−1)/x_k, degenerating to the EXACT count when the group
  * holds fewer than k distinct hashes.
  *
  * Inputs are md5-derived 60-bit hashes (`TextFunctions.md5Int(·, 15)`
  * — see [[graft.operators.TextCorpus.kmvSplitOverlap]] for the
  * same-family batch set algebra), so every estimate this aggregator
  * emits has an ANSI-SQL closed form: rank the distinct hashes per
  * group, keep `rn ≤ k`, apply the same formula.
  */
class KmvDistinctAgg(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, "KMV needs k >= 2 for the (k-1)/x_k estimator")
  private val twoPow60 = 1152921504606846976.0

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) buf // distinct sketch: already present
    else {
      val ins = -idx - 1
      if (buf.length >= k && ins >= k) buf // ≥ current k-th min: irrelevant
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        if (n - ins - 1 > 0) System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // two-pointer union of sorted distinct arrays, k smallest kept
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (b(j) < a(i)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v } // shared hash: once
      out(n) = take
      n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1.0) / (buf(k - 1) / twoPow60)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
