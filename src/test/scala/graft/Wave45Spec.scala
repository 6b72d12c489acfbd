package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineQueries => P}

/** Wave 45 (q413): Huffman code design — checked against the
  * INVARIANTS an optimal prefix code must satisfy (Kraft equality,
  * optimal total cost via an independent priority-queue build with a
  * different tie-break, length monotonicity in frequency) rather than
  * replaying the engine's own merge order. */
class Wave45Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q413: Huffman lengths satisfy Kraft equality, optimality, monotonicity") {
    val rows = P.huffmanLengths(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 26)
    val maxLen = rows.map(_._3).max
    // Kraft–McMillan EQUALITY (a Huffman tree is full):
    // Σ 2^(maxLen − len) == 2^maxLen, in exact BigInt
    val kraft = rows.map(r => BigInt(1) << (maxLen - r._3)).sum
    assert(kraft == (BigInt(1) << maxLen), s"Kraft sum $kraft != 2^$maxLen")
    // optimal total cost: an independent Huffman with a DIFFERENT
    // (reversed-id) tie-break must give the same Σ freq·len — Huffman
    // cost is unique across all optimal trees
    val pq = scala.collection.mutable.PriorityQueue
      .empty[(Long, Int)](Ordering.by { case (f, id) => (-f, id) })
    rows.zipWithIndex.foreach { case ((_, f, _), i) => pq.enqueue((f, -i)) }
    var nid = 1000
    val costAcc = scala.collection.mutable.ArrayBuffer[Long]()
    while (pq.size > 1) {
      val (f1, _) = pq.dequeue(); val (f2, _) = pq.dequeue()
      costAcc += f1 + f2 // each merge adds its mass once per level
      pq.enqueue((f1 + f2, nid)); nid += 1
    }
    val gotCost = rows.map(r => r._2 * r._3).sum
    assert(gotCost == costAcc.sum, s"total bits $gotCost vs ${costAcc.sum}")
    // monotonicity: strictly more frequent symbols never get longer codes
    for (a <- rows; b <- rows if a._2 > b._2)
      assert(a._3 <= b._3, s"${a._1} (${a._2}) longer than ${b._1} (${b._2})")
    // avg code length within [H, H+1)
    val total = rows.map(_._2).sum.toDouble
    val h = -rows.filter(_._2 > 0).map { r =>
      val p = r._2 / total; p * math.log(p) / math.log(2)
    }.sum
    val avg = gotCost / total
    assert(avg >= h - 1e-9 && avg < h + 1, s"avg $avg vs entropy $h")
  }
}
