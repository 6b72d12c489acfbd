package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed mergeable [[Aggregator]] — the
  * scale-safe replacement for `row_number() OVER (PARTITION BY g ORDER
  * BY s) <= k` when k is small and groups are huge: the window form
  * shuffles EVERY row to its group's partition and sorts the whole
  * group; this aggregator keeps k (score, id) pairs per group, combines
  * map-side (partial ObjectHashAggregate), and ships only k rows per
  * group across the wire. Same mergeable-summaries argument as
  * [[KmvDistinctAgg]] — `merge` is the associative k-truncated sorted
  * union — so it also runs unchanged under streaming aggregation.
  *
  * Ordering is (score DESC, id ASC): fully deterministic under ties,
  * and restatable in SQL (`ORDER BY s DESC, id`) so the gate oracle is
  * a plain window — the aggregator must reproduce the window's answer
  * EXACTLY, which is the point of gating it.
  *
  * State is two parallel arrays kept sorted; insert is O(k) — fine for
  * the small-k regime this exists for (top-k per key at k ≤ ~100). For
  * large k a window is the right plan; the operator docs say so rather
  * than pretending one shape wins everywhere.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, "top-k needs k >= 1")

  override def zero: Seq[(Double, Long)] = Nil

  // (a) beats (b) when score higher, or equal score and smaller id
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(buf: Seq[(Double, Long)],
      x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val (better, worse) = buf.partition(beats(_, x))
      (better :+ x) ++ worse.take(k - better.size - 1)
    }
  }

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // two-pointer merge of sorted lists, k best kept
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0; var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      if (i >= a.size) { out += b(j); j += 1 }
      else if (j >= b.size) { out += a(i); i += 1 }
      else if (beats(a(i), b(j))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
