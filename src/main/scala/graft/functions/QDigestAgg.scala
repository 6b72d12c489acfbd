package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Q-digest mergeable quantile sketch as a typed [[Aggregator]] — the
  * quantile member of the engine's sketch family (HLL, KMV, CMS,
  * Misra-Gries, TopK, Bloom — all mergeable, all bounded-state; rank
  * statistics were the gap). Shewchuk/Suri q-digest (Cormode et al.,
  * "Space- and time-efficient deterministic algorithms for biased
  * quantiles over data streams" lineage): values live on a complete
  * binary tree over the integer universe [0, 2^logU); a node's count
  * may sit on any ancestor of its leaf, and COMPRESS folds any sibling
  * pair whose (self + sibling + parent) mass is below n/σ into the
  * parent. Both invariant and merge (pointwise count add, recompress)
  * are DETERMINISTIC — no hashing, no randomness — and the rank error
  * of any quantile answered from the digest is ≤ log2(U)/σ · n
  * regardless of merge order, which is exactly the fact the q199 gate
  * proves against exact ranks.
  *
  * State: a node-id-sorted array of (id, count) pairs, flattened
  * stride-2 into one Array[Long] (heap numbering: root = 1, leaf for
  * value v = U + v). Size after compress ≤ 3σ entries — bounded
  * regardless of group size, so map-side partial aggregation ships
  * kilobytes per group at any data scale, the same property the KMV /
  * HLL aggregators lean on. Inserts are binary-search increments
  * (in-place when the leaf exists — the common case once a group has
  * seen its typical values); compress runs only when the buffer
  * exceeds 6σ entries, amortizing its O(size) cost.
  *
  * `finish` answers the fixed quantile targets `ps` by the standard
  * postorder walk (nodes ordered by range-max ascending, deeper nodes
  * first on ties; accumulate counts until ≥ ⌈p·n⌉, report the node's
  * range max) and appends n and the final sketch size so callers can
  * gate the published bounds. Values are clamped into the universe —
  * callers pick logU to cover their domain (token counts: 2^16).
  */
class QDigestAgg(sigma: Int, logU: Int, ps: Seq[Double])
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(sigma >= 1 && logU >= 1 && logU <= 32 && ps.nonEmpty)
  private val U = 1L << logU

  override def zero: Array[Long] = Array.emptyLongArray

  /** index of id in the stride-2 pair array, or -(insertion point)-1. */
  private def find(buf: Array[Long], id: Long): Int = {
    var lo = 0
    var hi = buf.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = buf(2 * mid)
      if (m == id) return mid
      else if (m < id) lo = mid + 1
      else hi = mid - 1
    }
    -(lo + 1)
  }

  private def insert(buf: Array[Long], id: Long, c: Long): Array[Long] = {
    val i = find(buf, id)
    if (i >= 0) { buf(2 * i + 1) += c; buf }
    else {
      val ins = -i - 1
      val out = new Array[Long](buf.length + 2)
      System.arraycopy(buf, 0, out, 0, 2 * ins)
      out(2 * ins) = id
      out(2 * ins + 1) = c
      System.arraycopy(buf, 2 * ins, out, 2 * ins + 2, buf.length - 2 * ins)
      out
    }
  }

  private def total(buf: Array[Long]): Long = {
    var s = 0L
    var i = 1
    while (i < buf.length) { s += buf(i); i += 2 }
    s
  }

  /** Fold sibling pairs lighter than n/σ (with their parent) upward.
    * Descending id order visits children before parents. */
  private def compress(buf: Array[Long]): Array[Long] = {
    val t = total(buf) / sigma
    if (t <= 0L) return buf
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < buf.length) { m(buf(i)) = buf(i + 1); i += 2 }
    val ids = m.keys.toArray
    java.util.Arrays.sort(ids)
    var j = ids.length - 1
    while (j >= 0) {
      val id = ids(j)
      if (id > 1L && m.contains(id)) {
        val sib = id ^ 1L
        val par = id >>> 1
        val mass = m(id) + m.getOrElse(sib, 0L) + m.getOrElse(par, 0L)
        if (mass < t) {
          m(par) = mass
          m.remove(id)
          m.remove(sib)
        }
      }
      j -= 1
    }
    val ks = m.keys.toArray
    java.util.Arrays.sort(ks)
    val out = new Array[Long](ks.length * 2)
    var x = 0
    while (x < ks.length) {
      out(2 * x) = ks(x)
      out(2 * x + 1) = m(ks(x))
      x += 1
    }
    out
  }

  private def maybeCompress(buf: Array[Long]): Array[Long] =
    if (buf.length / 2 > 6 * sigma) compress(buf) else buf

  override def reduce(buf: Array[Long], v0: Long): Array[Long] = {
    val v = math.min(math.max(v0, 0L), U - 1L)
    maybeCompress(insert(buf, U + v, 1L))
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // pointwise count add of two id-sorted pair arrays, then recompress
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var n = 0
    while (i < a.length || j < b.length) {
      if (j >= b.length || (i < a.length && a(i) < b(j))) {
        out(n) = a(i); out(n + 1) = a(i + 1); i += 2
      } else if (i >= a.length || b(j) < a(i)) {
        out(n) = b(j); out(n + 1) = b(j + 1); j += 2
      } else {
        out(n) = a(i); out(n + 1) = a(i + 1) + b(j + 1); i += 2; j += 2
      }
      n += 2
    }
    maybeCompress(
      if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  /** `[est(ps(0)), …, est(ps(last)), n, sketchSize]`. */
  override def finish(buf: Array[Long]): Array[Long] = {
    val n = total(buf)
    val size = buf.length / 2
    if (n == 0L) return ps.map(_ => 0L).toArray ++ Array(0L, size.toLong)
    // postorder: range-max ascending, deeper (smaller-range) first
    val idx = Array.range(0, size)
    val keyed = idx.map { i =>
      val id = buf(2 * i)
      val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
      val span = logU - depth // node covers 2^span values
      val vmax = ((id - (1L << depth) + 1L) << span) - 1L
      (vmax, span, buf(2 * i + 1))
    }.sortBy { case (vmax, span, _) => (vmax, span) }
    val ests = ps.map { p =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var k = 0
      var est = keyed.last._1
      var done = false
      while (k < keyed.length && !done) {
        cum += keyed(k)._3
        if (cum >= target) { est = keyed(k)._1; done = true }
        k += 1
      }
      math.min(est, U - 1L)
    }
    ests.toArray ++ Array(n, size.toLong)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
